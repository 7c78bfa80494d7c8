"""Pure-Python single-threaded reference scheduler (the golden oracle).

This is the transposition of the reference's crawl loop to URLs
(SURVEY.md §5.2): seed list -> rounds of (canonicalize, robots gate,
seen-set dedup, per-host politeness budget, (priority, host,
discovery_ts, url) priority pop, fetch with failure injection, outlink
discovery, retry/skip bookkeeping) — producing the golden crawl trace and
final URL-seen set the Spark engine must match exactly.

Semantics it encodes (reference file:line):
  * resume point / monotone progress  — crawler_service.go:199-226
  * batch window pop                  — crawler_service.go:251-307
  * per-item fetch pipeline           — crawler_service.go:417-489
  * rate limiting -> per-host budget  — ethereum_service.go:585-591
  * robots gate <- SkipReceipts       — config.go:41; ethereum_service.go:279
  * dedup-before-write <- unique idx  — mongodb.go:86-92,111-115
  * retry count + temporary skip      — scheduler_service.go:324-357,291-303
  * publish-after-commit ordering     — crawler_service.go:592-607

BINDING ORDER DEFINITIONS (the engine implements the same, SURVEY §7
known-hard #1):
  * discovery total order within a round: sorted by url_canon; seq
    assigned 0..n-1; discovery_ts = cfg.discovery_unix(round, seq).
    Seeds are discovered in round 0; fetch rounds are 1-based.
  * pop order: per-host rank by (priority, discovery_ts, url_canon)
    capped at the host budget, then globally by (priority, host,
    discovery_ts, url_canon), first batch_size rows.
  * trace: successfully fetched URLs only, seq = rank within the round
    under the pop order restricted to fetched rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from ethereum_raw_data_crawler_spark.config import CrawlConfig
from ethereum_raw_data_crawler_spark.functions.extract import (
    extract_page,
    extract_text,
)
from ethereum_raw_data_crawler_spark.functions.urls import (
    canonicalize_url,
    host_of,
    path_of,
    url_hash64,
)
from ethereum_raw_data_crawler_spark.schemas import (
    STATUS_FAILED,
    STATUS_FETCHED,
    STATUS_PENDING,
)


@dataclass
class _Row:
    url: str
    url_canon: str
    url_hash: int
    host: str
    priority: int
    discovery_unix: int
    status: str = STATUS_PENDING
    retry_count: int = 0
    skip_until: int | None = None  # first round eligible again
    round: int = 0


@dataclass
class OracleResult:
    trace: list[tuple[int, int, str, str]] = field(default_factory=list)
    seen: dict[int, tuple[str, int]] = field(default_factory=dict)
    pages_out: list[dict] = field(default_factory=list)
    frontier: dict[str, _Row] = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)
    rounds_run: int = 0


class OracleScheduler:
    """Single-threaded reference implementation. ~150 LoC, no Spark."""

    def __init__(
        self,
        pages: pd.DataFrame,
        seeds: pd.DataFrame,
        robots: pd.DataFrame,
        politeness: pd.DataFrame,
        fetch_failures: pd.DataFrame | None,
        cfg: CrawlConfig,
    ) -> None:
        self.cfg = cfg
        self.corpus: dict[str, tuple[bytes, object, str]] = {}
        for r in pages.itertuples(index=False):
            canon = canonicalize_url(r.url)
            assert canon is not None and canon not in self.corpus, (
                "corpus must be unique per canonical url"
            )
            self.corpus[canon] = (bytes(r.html), r.warc_ts, r.lang)
        self.robots = {
            r.host: (bool(r.allowed), r.disallow_prefix)
            for r in robots.itertuples(index=False)
        }
        self.budget = {
            r.host: int(r.budget_per_round)
            for r in politeness.itertuples(index=False)
        }
        self.failures: dict[str, set[int]] = {}
        self.failure_class: dict[str, str] = {}
        if fetch_failures is not None:
            for r in fetch_failures.itertuples(index=False):
                self.failures[r.url_canon] = set(int(a) for a in r.fail_attempts)
                cls = getattr(r, "error_class", None)
                if isinstance(cls, str):
                    self.failure_class[r.url_canon] = cls
        self.res = OracleResult()
        self._seeds = seeds

    # -- robots gate (SkipReceipts analogue) --------------------------------
    def _admitted(self, url_canon: str, host: str) -> bool:
        allowed, prefix = self.robots.get(host, (True, None))
        if not allowed:
            return False
        if prefix is not None and isinstance(prefix, str) and path_of(
            url_canon
        ).startswith(prefix):
            return False
        return True

    # -- discovery: candidates -> frontier + seen ---------------------------
    def _discover(
        self, candidates: list[tuple[str, int]], rnd: int, precanon: bool = False
    ) -> dict:
        n_raw_valid = 0
        groups: dict[str, tuple[int, str]] = {}  # canon -> (min prio, min raw url)
        for raw, prio in candidates:
            canon = raw if precanon else canonicalize_url(raw)
            if canon is None:
                continue
            n_raw_valid += 1
            cur = groups.get(canon)
            if cur is None or (prio, raw) < cur:
                groups[canon] = (prio, raw)
        dup_collapsed = n_raw_valid - len(groups)
        robots_filtered = 0
        deduped = dup_collapsed
        admitted = []
        for canon in sorted(groups):
            prio, raw = groups[canon]
            if prio > self.cfg.priority_cap:
                deduped += 1
                continue
            host = host_of(canon)
            if host is None or not self._admitted(canon, host):
                robots_filtered += 1
                continue
            h = url_hash64(canon)
            if h in self.res.seen:
                deduped += 1
                continue
            admitted.append((canon, raw, prio, host, h))
        for seq, (canon, raw, prio, host, h) in enumerate(admitted):
            self.res.frontier[canon] = _Row(
                url=raw,
                url_canon=canon,
                url_hash=h,
                host=host,
                priority=prio,
                discovery_unix=self.cfg.discovery_unix(rnd, seq),
                round=rnd,
            )
            self.res.seen[h] = (canon, rnd)
        return {
            "discovered": len(admitted),
            "deduped": deduped,
            "robots_filtered": robots_filtered,
        }

    # -- one round (crawler_service.go:251-307 + 417-489) -------------------
    def run_round(self, rnd: int) -> dict:
        cfg = self.cfg
        eligible = [
            r
            for r in self.res.frontier.values()
            if r.status == STATUS_PENDING
            and (r.skip_until is None or r.skip_until <= rnd)
        ]
        # per-host budget (rate limiter recast as select-time budget)
        by_host: dict[str, list[_Row]] = {}
        for r in eligible:
            by_host.setdefault(r.host, []).append(r)
        survivors: list[_Row] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (r.priority, r.discovery_unix, r.url_canon))
            survivors.extend(rows[: self.budget.get(host, cfg.default_budget)])
        # global priority pop
        survivors.sort(
            key=lambda r: (r.priority, r.host, r.discovery_unix, r.url_canon)
        )
        popped = survivors[: cfg.batch_size]

        fetched_rows: list[tuple[_Row, bytes, object, str]] = []
        errors = 0
        for r in popped:
            attempt = r.retry_count + 1
            fail = attempt in self.failures.get(r.url_canon, ())
            hit = self.corpus.get(r.url_canon)
            if fail or hit is None:
                errors += 1
                r.retry_count += 1
                r.round = rnd
                # class-specific backoff, mirroring the engine exactly
                # (reference: ethereum_service.go:100-124,594-624); a miss
                # (URL absent from the corpus) has no class -> default
                cls = (
                    self.failure_class.get(r.url_canon)
                    if (fail and hit is not None)
                    else None
                )
                if cls == "non_retryable" or r.retry_count >= cfg.hard_fail_retries:
                    r.status = STATUS_FAILED
                elif cls == "rate_limit":
                    r.skip_until = rnd + min(
                        r.retry_count * r.retry_count, cfg.rate_limit_skip_cap
                    )
                elif r.retry_count >= cfg.max_retries:
                    r.skip_until = rnd + cfg.skip_rounds
                continue
            fetched_rows.append((r, *hit))

        candidates: list[tuple[str, int]] = []
        for seq, (r, html, warc_ts, lang) in enumerate(fetched_rows):
            r.status = STATUS_FETCHED
            r.round = rnd
            text = extract_text(html)
            self.res.trace.append((rnd, seq, r.url_canon, r.host))
            self.res.pages_out.append(
                {
                    "url": r.url_canon,
                    "warc_ts": warc_ts,
                    "html": html,
                    "text": text,
                    "lang": lang,
                    "fetch_round": rnd,
                    "fetch_seq": seq,
                }
            )
            _text, canon_links = extract_page(html, r.url_canon)
            for link in canon_links:
                candidates.append((link, r.priority + 1))

        disc = self._discover(candidates, rnd, precanon=True)
        m = {
            "round": rnd,
            "popped": len(popped),
            "fetched": len(fetched_rows),
            "errors": errors,
            **disc,
        }
        self.res.metrics.append(m)
        return m

    def run(self) -> OracleResult:
        """Seed (round 0) then rounds until the frontier is exhausted."""
        seed_candidates = [
            (r.url, int(r.priority)) for r in self._seeds.itertuples(index=False)
        ]
        self._discover(seed_candidates, 0)
        rnd = 0
        while rnd < self.cfg.max_rounds:
            rnd += 1
            pending = [
                r for r in self.res.frontier.values() if r.status == STATUS_PENDING
            ]
            if not pending:
                break
            self.run_round(rnd)
        self.res.rounds_run = rnd
        return self.res


def run_oracle(
    pages: pd.DataFrame,
    seeds: pd.DataFrame,
    robots: pd.DataFrame,
    politeness: pd.DataFrame,
    fetch_failures: pd.DataFrame | None = None,
    cfg: CrawlConfig | None = None,
) -> OracleResult:
    return OracleScheduler(
        pages, seeds, robots, politeness, fetch_failures, cfg or CrawlConfig()
    ).run()
