"""Host-level link-graph tracking + PageRank frontier rescoring.

The engine (track_host_graph=True) appends a per-round (src_host,
dst_host, n) aggregate inside each atomic commit; rescore_priorities
runs PageRank over the accumulated graph and lowers the priority of
pending frontier rows on the top hosts. Oracles here are pure Python:
link extraction re-run per fetched page, single-threaded power
iteration, and an explicit top-k + boost rule over the collected
frontier.
"""

import json
import math

from pyspark.sql import functions as F

from ethereum_raw_data_crawler_spark.config import CrawlConfig
from ethereum_raw_data_crawler_spark.functions.extract import extract_page
from ethereum_raw_data_crawler_spark.functions.urls import host_of
from ethereum_raw_data_crawler_spark.plans.rounds import CrawlEngine
from ethereum_raw_data_crawler_spark.schemas import STATUS_PENDING


def _mk_engine(spark, tmp_path, tabs, cfg, **kw):
    return CrawlEngine.create(
        spark,
        str(tmp_path / "store"),
        spark.createDataFrame(tabs["pages"]),
        spark.createDataFrame(tabs["seeds"]),
        spark.createDataFrame(tabs["robots"]),
        spark.createDataFrame(tabs["politeness"]),
        spark.createDataFrame(tabs["fetch_failures"]),
        cfg,
        **kw,
    )


def _expected_edges(eng):
    """Re-derive host_edges from the committed pages_out via the binding
    extractor: per fetched page, per-doc-deduped canonical outlinks ->
    (src_host, dst_host) pairs, self-host excluded, counted per round."""
    from ethereum_raw_data_crawler_spark.schemas import PAGES_OUT

    rows = eng.store.read(eng.spark, "pages_out", PAGES_OUT).collect()
    counts: dict[tuple, int] = {}
    for r in rows:
        src_host = host_of(r["url"])
        _, links = extract_page(bytes(r["html"]), r["url"])
        for link in links:
            dst_host = host_of(link)
            if dst_host and dst_host != src_host:
                key = (src_host, dst_host, r["fetch_round"])
                counts[key] = counts.get(key, 0) + 1
    return {k + (v,) for k, v in counts.items()}


def _pagerank_oracle(edge_list, damping=0.85, iterations=8):
    nodes = sorted({u for e in edge_list for u in e})
    n = len(nodes)
    outdeg: dict = {}
    for u, _ in edge_list:
        outdeg[u] = outdeg.get(u, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        sums: dict = {}
        for u, v in edge_list:
            sums[v] = sums.get(v, 0.0) + ranks[u] / outdeg[u]
        ranks = {
            v: (1.0 - damping) / n + damping * sums.get(v, 0.0) for v in nodes
        }
    return ranks


def test_host_edges_match_python_extraction(spark, t1_tables, tmp_path):
    cfg = CrawlConfig(batch_size=60)
    eng = _mk_engine(spark, tmp_path, t1_tables, cfg, track_host_graph=True)
    eng.run(max_rounds=3)

    got = {
        (r["src_host"], r["dst_host"], r["round"], r["n"])
        for r in eng.host_edges().collect()
    }
    assert got == _expected_edges(eng)
    assert got, "t1 corpus links across hosts; the graph must be non-empty"
    # self-host edges are excluded by construction
    assert all(s != d for s, d, _, _ in got)
    # the phase split records the aggregation's cost
    # (commit_host_graph appears in the round stats)


def test_rescore_matches_python_oracle(spark, t1_tables, tmp_path):
    cfg = CrawlConfig(batch_size=60)
    eng = _mk_engine(spark, tmp_path, t1_tables, cfg, track_host_graph=True)
    eng.run(max_rounds=2)

    pairs = sorted(
        {
            (r["src_host"], r["dst_host"])
            for r in eng.host_edges().collect()
        }
    )
    before = {
        r["url_canon"]: r.asDict() for r in eng.frontier().collect()
    }
    round_before = eng.store.round

    top_frac, boost = 0.30, 1
    stats = eng.rescore_priorities(top_frac=top_frac, boost=boost)

    # ---- oracle: rank -> ppb -> top-k -> boost rule --------------------
    ranks = _pagerank_oracle(pairs)
    ppb = {
        v: int(math.floor(r * 1e9 + 0.5)) for v, r in ranks.items()
    }  # HALF_UP, matching Spark's F.round on positives
    order = sorted(ppb, key=lambda v: (-ppb[v], v))
    k = max(1, int(math.ceil(top_frac * len(order))))
    top = set(order[:k])
    expected = {}
    for url, row in before.items():
        want = dict(row)
        if (
            row["status"] == STATUS_PENDING
            and row["priority"] > 0
            and row["host"] in top
        ):
            want["priority"] = max(0, row["priority"] - boost)
        expected[url] = want

    after = {r["url_canon"]: r.asDict() for r in eng.frontier().collect()}
    assert after == expected
    n_changed = sum(
        1 for u in before if after[u]["priority"] != before[u]["priority"]
    )
    assert stats["hosts"] == len(order) and stats["top_k"] == k
    assert stats["boosted"] == n_changed > 0, "t1 shape must boost some rows"
    # the rescore consumed its own round slot (snapshot per commit)
    assert eng.store.round == round_before + 1

    # idempotence at priority 0: a second rescore never drives below 0
    eng.rescore_priorities(top_frac=top_frac, boost=10)
    assert all(r["priority"] >= 0 for r in eng.frontier().collect())


def test_rescore_then_resume_changes_crawl_order(spark, t1_tables, tmp_path):
    """Twin engines, identical through round 1; one rescores. The rescored
    twin's next round must differ (the new priorities reach the pop), and
    both must stay duplicate-free across the rescore boundary."""
    cfg = CrawlConfig(batch_size=60)
    eng_a = _mk_engine(
        spark, tmp_path / "a", t1_tables, cfg, track_host_graph=True
    )
    eng_b = _mk_engine(
        spark, tmp_path / "b", t1_tables, cfg, track_host_graph=True
    )
    eng_a.run(max_rounds=1)
    eng_b.run(max_rounds=1)
    stats = eng_a.rescore_priorities(top_frac=0.5)
    assert stats["boosted"] > 0

    # config round-trips the flag; the resumed engine keeps tracking
    eng_a2 = CrawlEngine.resume(spark, str(tmp_path / "a" / "store"))
    assert eng_a2.track_host_graph is True
    ra = eng_a2.run(max_rounds=eng_a2.store.round + 1)
    rb = eng_b.run(max_rounds=2)
    assert ra and ra[0]["fetched"] > 0

    def fetched_rounds(eng):
        return [
            (r["seq"], r["url_canon"])
            for r in eng.read_trace()
            .where(F.col("round") == eng.store.round)
            .collect()
        ]

    order_a = sorted(fetched_rounds(eng_a2))
    order_b = sorted(fetched_rounds(eng_b))
    assert order_a != order_b, "rescored priorities must reach the pop"
    # no duplicate fetches across the rescore boundary
    urls = [r["url_canon"] for r in eng_a2.read_trace().collect()]
    assert len(urls) == len(set(urls))
    assert rb  # twin sanity


def test_untracked_store_empty_graph_and_rescore_noop(
    spark, t1_tables, tmp_path
):
    cfg = CrawlConfig(batch_size=60)
    eng = _mk_engine(spark, tmp_path, t1_tables, cfg)  # default: off
    eng.run(max_rounds=2)
    assert eng.host_edges().count() == 0
    round_before = eng.store.round
    stats = eng.rescore_priorities()
    assert stats == {"hosts": 0, "top_k": 0, "boosted": 0, "round": None}
    assert eng.store.round == round_before  # no commit
    with open(str(tmp_path / "store" / "config.json")) as fh:
        assert json.load(fh)["track_host_graph"] is False
