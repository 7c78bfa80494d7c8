"""Unit tests: synthetic corpus determinism + oracle scheduler semantics
(SURVEY.md §5.2 items 1, 3)."""

import pandas as pd

from ethereum_raw_data_crawler_spark.config import CrawlConfig
from ethereum_raw_data_crawler_spark.functions.urls import canonicalize_url, url_hash64
from ethereum_raw_data_crawler_spark.plans.oracle import run_oracle
from ethereum_raw_data_crawler_spark.sources import synth


def test_synth_deterministic():
    a = synth.gen_all(synth.T1)
    b = synth.gen_all(synth.T1)
    for k in a:
        pd.testing.assert_frame_equal(a[k], b[k])


def test_synth_canonical_urls_unique():
    pages = synth.gen_pages(synth.T1)
    canon = pages["url"].map(canonicalize_url)
    assert canon.notna().all()
    assert canon.is_unique


def test_synth_text_column_is_extractor_output():
    """The stored text column IS extract_text(html) — the generator and the
    per-row invariant agree by construction (FIXTURES.md §1)."""
    from ethereum_raw_data_crawler_spark.functions.extract import extract_text

    pages = synth.gen_pages(synth.T1)
    for r in pages.itertuples(index=False):
        assert extract_text(bytes(r.html)) == r.text


def test_oracle_t1_invariants():
    tabs = synth.gen_all(synth.T1)
    cfg = CrawlConfig(batch_size=50)
    res = run_oracle(
        tabs["pages"], tabs["seeds"], tabs["robots"], tabs["politeness"],
        tabs["fetch_failures"], cfg,
    )
    assert res.trace, "crawl fetched nothing"
    # trace seq is dense 0..n-1 per round
    by_round = {}
    for rnd, seq, url, host in res.trace:
        by_round.setdefault(rnd, []).append(seq)
    for rnd, seqs in by_round.items():
        assert seqs == list(range(len(seqs)))
    # politeness: per (host, round) fetch count never exceeds budget
    budgets = dict(
        zip(tabs["politeness"]["host"], tabs["politeness"]["budget_per_round"])
    )
    per = {}
    for rnd, seq, url, host in res.trace:
        per[(host, rnd)] = per.get((host, rnd), 0) + 1
    for (host, rnd), n in per.items():
        assert n <= budgets.get(host, cfg.default_budget), (host, rnd, n)
    # seen-set contains exactly the admitted frontier
    assert set(res.seen) == {r.url_hash for r in res.frontier.values()}
    # every fetched page has byte-exact text vs corpus column (shared fn)
    corpus = {
        canonicalize_url(r.url): r.text for r in tabs["pages"].itertuples(index=False)
    }
    for p in res.pages_out:
        assert p["text"] == corpus[p["url"]]
    # duplicates + variants in seeds collapsed: each canon appears once in trace
    urls = [u for _, _, u, _ in res.trace]
    assert len(urls) == len(set(urls))


def test_oracle_retry_skip_state_machine():
    """A URL failing attempts 1-3 must transition through skip_until and
    recover (reference: scheduler_service.go:324-357, 291-303)."""
    pages = synth.gen_pages(synth.T1)
    seeds = pd.DataFrame({"url": ["https://host1.example/p/0"], "priority": [0]})
    robots = synth.gen_robots(synth.T1)
    politeness = synth.gen_politeness(synth.T1)
    failures = pd.DataFrame(
        {"url_canon": ["https://host1.example/p/0"], "fail_attempts": [[1, 2, 3]]}
    )
    cfg = CrawlConfig(batch_size=10, max_retries=3, skip_rounds=2)
    res = run_oracle(pages, seeds, robots, politeness, failures, cfg)
    row = res.frontier["https://host1.example/p/0"]
    assert row.status == "fetched"
    assert row.retry_count == 3
    # failed rounds 1,2,3 -> skip_until = 3+2 = 5 -> fetched in round 5
    assert row.skip_until == 5
    fetch_rounds = [rnd for rnd, _, u, _ in res.trace if u == row.url_canon]
    assert fetch_rounds[0] == 5


def test_oracle_robots_never_seen():
    """Disallowed hosts' URLs never enter seen nor trace (FIXTURES.md §3)."""
    tabs = synth.gen_all(synth.T2)
    cfg = CrawlConfig(batch_size=500)
    res = run_oracle(
        tabs["pages"], tabs["seeds"], tabs["robots"], tabs["politeness"], None, cfg
    )
    banned_hosts = set(
        tabs["robots"].loc[~tabs["robots"]["allowed"], "host"]
    )
    assert banned_hosts, "fixture should ban some hosts at t2"
    for h, (canon, rnd) in res.seen.items():
        host = canon.split("://")[1].split("/")[0]
        assert host not in banned_hosts
    # disallow_prefix rows filtered too
    pref = tabs["robots"].dropna(subset=["disallow_prefix"])
    for host, prefix in zip(pref["host"], pref["disallow_prefix"]):
        for h, (canon, rnd) in res.seen.items():
            if canon.split("://")[1].split("/")[0] == host:
                path = "/" + canon.split("://")[1].split("/", 1)[1]
                assert not path.startswith(prefix)
    assert any(m["robots_filtered"] > 0 for m in res.metrics)
