"""The Spark crawl engine: bounded partition-parallel batch rounds.

One round = one declarative DataFrame DAG per sink (SURVEY.md §3.1
"Spark recast" of the reference's polling round, reference:
internal/application/service/crawler_service.go:229-370):

    read frontier snapshot
      -> eligibility filter (retry/skip gate, scheduler_service.go:291-303)
      -> per-host politeness budget + (priority, host, discovery_ts, url)
         priority pop               (crawler_service.go:251-307 recast)
      -> fetch = partition-pruned join against the bucketed corpus
         (GetBlockByNumber, ethereum_service.go:142-185 recast; failure
         injection stands in for RPC errors)
      -> extract text + outlinks    (convertBlock, ethereum_service.go:421-456)
      -> discovery: canonicalize -> robots gate -> Bloom + anti-join dedup
         -> new frontier rows       (dedup-before-write, mongodb.go:86-92)
      -> one atomic snapshot commit of pages/seen/trace/metrics + frontier
         upsert                     (publish-after-save, crawler_service.go:592-607)

Resume = open the store and continue from ``manifest.round + 1``
(initializeStartingBlock, crawler_service.go:199-226): a kill between or
during rounds never corrupts state because a round's writes are invisible
until its single manifest swap.

Determinism under parallelism (SURVEY.md §7 known-hard #1): every
sequence the oracle defines is derived from explicit total orders
(sorted-before-seq), never from partition iteration order, so local[2]
and local[32] produce identical traces.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ethereum_raw_data_crawler_spark.config import CrawlConfig
from ethereum_raw_data_crawler_spark.functions.spark_udfs import (
    canonicalize_udf,
    extract_page_udf,
    with_host_and_path,
)
from ethereum_raw_data_crawler_spark.functions.urls import CANON_VERSION
from ethereum_raw_data_crawler_spark.operators.bloom import (
    PartitionedBloom,
    split_by_bloom,
)
from ethereum_raw_data_crawler_spark.operators.cuckoo import PartitionedCuckoo
from ethereum_raw_data_crawler_spark.operators.priority_pop import pop_batch
from ethereum_raw_data_crawler_spark.schemas import (
    FETCH_FAILURES,
    FRONTIER,
    HEALTH,
    HOST_EDGES,
    METRICS,
    PAGES_OUT,
    POLITENESS,
    ROBOTS,
    SEEN,
    STATUS_FAILED,
    STATUS_FETCHED,
    STATUS_PENDING,
)
from ethereum_raw_data_crawler_spark.sources.tablestore import SnapshotStore

CORPUS = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_TABLES = {
    "corpus": "append",
    "robots": "append",
    "politeness": "append",
    "fetch_failures": "append",
    "pages_out": "append",
    "seen": "append",
    "metrics": "append",
    "health": "append",
    "host_edges": "append",
    "frontier": "mor",
}

# max slim popped rows per shuffled-hash build task (~100-200 MB of
# hash map at frontier-row width); the fetch join widens its exchange
# past the session shuffle width whenever batch/width would exceed it.
# Deploy-time override: SPARK_GRAFT_SHJ_BUILD_ROWS — lower it to give the
# fetch join (and therefore the cached fetch+parse result, whose
# partition layout every downstream per-page stage inherits) a finer
# partitioning than the session shuffle width.
SHJ_BUILD_ROWS = int(os.environ.get("SPARK_GRAFT_SHJ_BUILD_ROWS", "1500000"))


def shj_width(n_build_rows: int, conf_width: int) -> int:
    """Partition count for a shuffled-hash join exchange: at least the
    session's shuffle width (wide clusters keep their parallelism), but
    never fewer partitions than it takes to hold <= SHJ_BUILD_ROWS build
    rows each — the invariant that makes a hash build safe at any
    (batch size, cluster width) combination."""
    return max(conf_width, -(-n_build_rows // SHJ_BUILD_ROWS))


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        cfg: CrawlConfig,
        n_buckets: int = 32,
        use_bloom: bool = True,
        prune_pop: bool = True,
        compact_every: int = 8,
        egress_dir: str | None = None,
        bloom_buckets: int = 64,
        compact_debt_frac: float = 0.15,
        track_host_graph: bool = False,
        seen_filter: str = "bloom",
    ) -> None:
        from ethereum_raw_data_crawler_spark.deploy import ship_package

        ship_package(spark)
        self.spark = spark
        self.store = SnapshotStore(store_root)
        self.cfg = cfg
        self.n_buckets = n_buckets
        self.use_bloom = use_bloom
        self.prune_pop = prune_pop
        self.compact_every = compact_every
        self.bloom_buckets = bloom_buckets
        # health-ACTED threshold, RELATIVE: the frontier is compacted when
        # its accumulated delete set reaches this fraction of the base
        # fragment rows (both straight from parquet footers). Relative,
        # not absolute, because compaction cost is O(base rows): at a
        # 10^10-row frontier an absolute threshold of one batch's deletes
        # would rewrite the whole frontier EVERY round, while a fraction
        # amortizes the rewrite to O(batch / frac) rows per round. The
        # read path needs no trigger at all — SnapshotStore.read already
        # degrades gracefully past BROADCAST_DELETE_MAX (shuffle join
        # instead of broadcast), so the only question is amortized rewrite
        # cost, which is what the fraction controls.
        self.compact_debt_frac: float = compact_debt_frac
        # when on, each round appends the (src_host, dst_host) link-graph
        # aggregate to the host_edges table inside the atomic commit —
        # the input to rescore_priorities. Off by default: it adds one
        # O(outlinks) map-side-combined aggregation per round that a
        # crawl which never rescores shouldn't pay.
        self.track_host_graph: bool = track_host_graph
        # cache the corpus-join hit set (html included) below this popped
        # count; recompute slim branches above it (see run_round)
        self.HITS_CACHE_MAX: int = 2_000_000
        # seen-set prefilter family: "bloom" (default, 9.6 bits/URL) or
        # "cuckoo" (~17.8 bits/URL, ~80x lower FPR, and DELETABLE — the
        # forget_urls unlearn path stays on the fast probe; see
        # operators/cuckoo.py for the full trade)
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_filter must be 'bloom' or 'cuckoo', got {seen_filter!r}")
        self.seen_filter = seen_filter
        self._filter_cls = PartitionedBloom if seen_filter == "bloom" else PartitionedCuckoo
        self._bloom: PartitionedBloom | PartitionedCuckoo | None = None
        self._dims: dict[str, DataFrame] = {}
        self._scratch: list[DataFrame] = []
        self._egress = None
        if egress_dir:
            from ethereum_raw_data_crawler_spark.sources.egress import EgressWriter

            self._egress = EgressWriter(egress_dir)

    # ------------------------------------------------------------------ setup
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        store_root: str,
        pages: DataFrame,
        seeds: DataFrame,
        robots: DataFrame,
        politeness: DataFrame,
        fetch_failures: DataFrame | None,
        cfg: CrawlConfig | None = None,
        **kw,
    ) -> "CrawlEngine":
        """Job init (reference: cmd/schedulers/main.go:112-175 OnStart):
        create tables, land the corpus + dims, seed the frontier (round 0)."""
        cfg = cfg or CrawlConfig()
        expected_keys = kw.pop("expected_keys", None)
        auto_buckets = "bloom_buckets" not in kw
        SnapshotStore.create(store_root, _TABLES)
        eng = cls(spark, store_root, cfg, **kw)
        if eng.use_bloom:
            if expected_keys is None:
                # design capacity of the seen-set: seeds × a discovery
                # growth allowance. Per-bucket growth absorbs overshoot;
                # this only sizes the STARTING bitmaps + bucket count.
                expected_keys = max(int(seeds.count()) * 16, 1 << 20)
            if auto_buckets:
                eng.bloom_buckets = eng._filter_cls.buckets_for(expected_keys)
        with open(os.path.join(store_root, "config.json"), "w") as fh:
            json.dump(
                {
                    "cfg": asdict(cfg),
                    "n_buckets": eng.n_buckets,
                    "use_bloom": eng.use_bloom,
                    "prune_pop": eng.prune_pop,
                    "compact_every": eng.compact_every,
                    "egress_dir": kw.get("egress_dir"),
                    "bloom_buckets": eng.bloom_buckets,
                    "compact_debt_frac": eng.compact_debt_frac,
                    "track_host_graph": eng.track_host_graph,
                    "seen_filter": eng.seen_filter,
                    "canon_version": CANON_VERSION,
                },
                fh,
            )
        if eng.use_bloom:
            eng._bloom = eng._filter_cls.create(
                store_root,
                n_buckets=eng.bloom_buckets,
                expected_keys=expected_keys,
            )
        txn = eng.store.transaction(-1)
        # canonicalize the corpus ONCE; bucket by url_hash for fetch-time
        # partition pruning (the "fetch" of a batch reads only the buckets
        # the batch hashes into, not the whole corpus)
        corpus = (
            pages.withColumn("url_canon", canonicalize_udf("url"))
            .where(F.col("url_canon").isNotNull())
            .withColumn("url_hash", F.xxhash64("url_canon"))
            .withColumn(
                "bucket", F.pmod(F.col("url_hash"), F.lit(eng.n_buckets)).cast("int")
            )
            .select("url_canon", "url_hash", "bucket", "warc_ts", "html", "lang")
        )
        txn.append("corpus", corpus, partition_by=["bucket"])
        txn.append(
            "robots",
            robots.select(
                "host",
                F.col("allowed").cast("boolean").alias("allowed"),
                F.col("disallow_prefix").cast("string").alias("disallow_prefix"),
            ),
        )
        txn.append(
            "politeness",
            politeness.select("host", F.col("budget_per_round").cast("int")),
        )
        if fetch_failures is None:
            fetch_failures = spark.createDataFrame([], FETCH_FAILURES)
        txn.append(
            "fetch_failures",
            fetch_failures.select(
                "url_canon",
                F.col("fail_attempts").cast("array<int>"),
                (
                    F.col("error_class").cast("string")
                    if "error_class" in fetch_failures.columns
                    else F.lit(None).cast("string")
                ).alias("error_class"),
            ),
        )
        txn.commit()
        eng._seed(seeds)
        return eng

    @classmethod
    def resume(cls, spark: SparkSession, store_root: str) -> "CrawlEngine":
        """Reopen from the last committed snapshot (reference:
        initializeStartingBlock, crawler_service.go:199-226 — max processed
        + 1; here: manifest.round + 1, with the Bloom bitmap rebuilt or
        reloaded)."""
        with open(os.path.join(store_root, "config.json")) as fh:
            saved = json.load(fh)
        # the seen-set keys on the canonical string: resuming under
        # different canonicalization rules would re-admit previously-seen
        # urls (url_hash drift). Stores created before the stamp existed
        # carry no version and are accepted as-is (documented in
        # functions/urls.py:CANON_VERSION).
        saved_canon = saved.get("canon_version")
        if saved_canon is not None and saved_canon != CANON_VERSION:
            raise RuntimeError(
                f"store was created under canonicalization rules "
                f"v{saved_canon} but this build implements "
                f"v{CANON_VERSION}; resuming would drift url_hash keys. "
                f"Re-crawl into a fresh store or run a migration that "
                f"re-canonicalizes frontier/seen/corpus url_canon columns."
            )
        cfg = CrawlConfig(**saved["cfg"])
        eng = cls(
            spark,
            store_root,
            cfg,
            n_buckets=saved["n_buckets"],
            use_bloom=saved["use_bloom"],
            prune_pop=saved["prune_pop"],
            compact_every=saved["compact_every"],
            egress_dir=saved.get("egress_dir"),
            bloom_buckets=saved.get("bloom_buckets", 64),
            compact_debt_frac=saved.get("compact_debt_frac", 0.15),
            track_host_graph=saved.get("track_host_graph", False),
            seen_filter=saved.get("seen_filter", "bloom"),
        )
        if eng._egress is not None:
            # publish-after-commit redelivery: any round committed before
            # the crash but never published goes out now (at-least-once)
            eng._egress.catch_up(spark, eng.store)
        if eng.use_bloom:
            bloom_rnd = eng._filter_cls.latest_round(store_root)
            if bloom_rnd is None:
                # bitmaps lost entirely: rebuild from the seen table
                # (correctness-neutral, executor-side Spark job)
                eng._bloom = eng._bloom_rebuild_spark()
            else:
                eng._bloom = eng._filter_cls.load(store_root, bloom_rnd)
                if bloom_rnd < eng.store.round:
                    # a crash between the manifest swap and the bloom meta
                    # write leaves the bitmaps behind the table — catch up
                    # by folding in the missed seen fragments (never skip:
                    # a stale bitmap means false negatives = duplicates)
                    missed = [
                        f
                        for f in eng.store.manifest()["tables"]["seen"][
                            "fragments"
                        ]
                        if f["seq"] > bloom_rnd
                    ]
                    if missed:
                        keys = eng.store._read_fragments(
                            spark, missed, SEEN
                        ).select("url_hash")
                        eng._bloom.add_keys(keys, "url_hash", eng.store.round)
                    else:
                        eng._bloom._write_meta(eng.store.round)
        return eng

    # ------------------------------------------------------------ table reads
    def _dim(self, name: str, schema) -> DataFrame:
        if name not in self._dims:
            self._dims[name] = self.store.read(self.spark, name, schema).cache()
        return self._dims[name]

    def frontier(self) -> DataFrame:
        return self.store.read(self.spark, "frontier", FRONTIER)

    def host_edges(self) -> DataFrame:
        """Accumulated host-level link graph (empty for stores that never
        tracked it — the table is registered at create time either way)."""
        if "host_edges" not in self.store.manifest()["tables"]:
            # stores created before §11: behave as an empty graph
            return self.spark.createDataFrame([], HOST_EDGES)
        return self.store.read(self.spark, "host_edges", HOST_EDGES)

    def seen(self) -> DataFrame:
        return self.store.read(self.spark, "seen", SEEN)

    def health(self) -> DataFrame:
        """Per-(round, component) health gauges (reference: system_health
        collection, crawler_metrics.go:46-53)."""
        return self.store.read(self.spark, "health", HEALTH)

    def delete_pages(self, predicate: str) -> int:
        """Takedown/redaction: row-level DELETE FROM pages_out WHERE
        ``predicate`` (reference: DeleteBlock/DeleteTransactionsByBlockHash,
        block_repository_impl.go:264-268). Copy-on-write, fragment-pruned;
        older snapshots still show the pre-delete state (time travel)."""
        return self.store.delete_where(
            self.spark, "pages_out", PAGES_OUT, predicate, self.store.round
        )

    def forget_urls(self, urls: list[str]) -> int:
        """Unlearn URLs from the seen set — the takedown follow-up /
        content-expiry recrawl path. Deletes the ``seen`` rows (ground
        truth: the anti-join backstop immediately treats the URLs as
        unseen, so a re-discovery re-enters the frontier) and, when the
        configured prefilter is deletable (``seen_filter="cuckoo"``),
        removes the keys from the filter too so re-discoveries stay on
        the zero-shuffle definitely-new fast path. With the Bloom
        prefilter the row delete alone is still CORRECT — the filter
        over-approximates and the exact anti-join sees the deletion —
        but every future sighting of a forgotten URL pays the slow path
        forever (bloom bits cannot be unset); that asymmetry is the
        cuckoo filter's reason to exist (operators/cuckoo.py).

        Takedown lists are human-scale (bounded like the ≤200k
        driver-side delete-key path): keys are canonicalized and hashed
        driver-side with the SAME pinned pure functions the engine's
        UDFs use (functions/urls.py — xxh64 JVM-equivalence is
        pytest-pinned). Returns the number of seen rows deleted."""
        from ethereum_raw_data_crawler_spark.functions.urls import (
            canonicalize_url,
            url_hash64,
        )

        hashes = sorted(
            {
                url_hash64(c)
                for u in urls
                if (c := canonicalize_url(u)) is not None
            }
        )
        if not hashes:
            return 0
        pred = f"url_hash IN ({','.join(str(h) for h in hashes)})"
        n = self.store.delete_where(
            self.spark, "seen", SEEN, pred, self.store.round
        )
        if self._bloom is not None and hasattr(self._bloom, "delete_keys"):
            keys_df = self.spark.createDataFrame(
                [(h,) for h in hashes], "url_hash long"
            )
            self._bloom.delete_keys(keys_df, "url_hash", self.store.round)
        return n

    def as_of(self, rnd: int, name: str, schema) -> DataFrame:
        """Time-travel read: table contents as committed at round ``rnd``
        (Iceberg snapshot-id reads — every round's manifest is retained).
        The audit/debug twin of resume: 'what did the frontier look like
        after round k?' without replaying anything."""
        v = self.store.version_for_round(rnd)
        return self.store.read(self.spark, name, schema, version=v)

    def read_trace(self) -> DataFrame:
        """The crawl trace (FIXTURES.md §7) is a projection of pages_out —
        (fetch_round, fetch_seq) ARE the trace order, so no separate table
        is written (one fewer sink per round)."""
        pages = self.store.read(self.spark, "pages_out", PAGES_OUT)
        return pages.select(
            F.col("fetch_round").alias("round"),
            F.col("fetch_seq").alias("seq"),
            F.col("url").alias("url_canon"),
            F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1).alias("host"),
        )

    # ------------------------------------------------------------- discovery
    def _discover(
        self, candidates: DataFrame, rnd: int, seen: DataFrame
    ) -> tuple[DataFrame, dict]:
        """Candidates (url, priority) -> admitted frontier rows with dense
        discovery_ts. Implements the oracle's binding order: group by
        url_canon keeping min (priority, url), robots gate, seen dedup,
        seq by sorted url_canon.

        Annotate-then-aggregate: instead of filter-and-count per stage
        (one Spark job each), every drop reason becomes a flag column and
        ONE aggregation yields all lineage counters — the map-side-combine
        version of the reference's in-memory counters
        (crawler_service.go:910-921)."""
        cfg = self.cfg
        import time as _time

        _dbg = os.environ.get("SPARK_GRAFT_PHASE_DEBUG") == "1"

        def _probe(name: str, frame: DataFrame) -> None:
            if _dbg:
                t0 = _time.monotonic()
                n = frame.count()
                print(
                    f"  [probe] {name}: {n} rows, {int((_time.monotonic()-t0)*1000)} ms",
                    flush=True,
                )

        if "url_canon" not in candidates.columns:
            candidates = candidates.withColumn("url_canon", canonicalize_udf("url"))
        _probe("candidates", candidates)
        grouped = (
            candidates.where(F.col("url_canon").isNotNull())
            .groupBy("url_canon")
            .agg(
                F.min(F.struct("priority", "url")).alias("m"),
                F.count("*").alias("dups"),
            )
            .select(
                "url_canon",
                F.col("m.priority").alias("priority"),
                F.col("m.url").alias("url"),
                "dups",
            )
        )
        _probe("grouped", grouped)
        robots = self._dim("robots", ROBOTS)
        gated = (
            with_host_and_path(grouped)
            .join(F.broadcast(robots), "host", "left")
            .withColumn("pass_cap", F.col("priority") <= cfg.priority_cap)
            .withColumn(
                "pass_robots",
                (F.col("allowed").isNull() | F.col("allowed"))
                & (
                    F.col("disallow_prefix").isNull()
                    | ~F.col("path").startswith(F.col("disallow_prefix"))
                ),
            )
            .drop("allowed", "disallow_prefix", "path")
            .withColumn("url_hash", F.xxhash64("url_canon"))
            .cache()  # feeds two union branches; uncached it would run 2x
        )
        self._scratch.append(gated)
        # seen-membership flag: Bloom kills the definitely-new rows map-side;
        # only maybe-seen rows reach the exact join against the seen table
        candidates_for_seen = gated.where(F.col("pass_cap") & F.col("pass_robots"))
        skipped_rows = gated.where(~(F.col("pass_cap") & F.col("pass_robots")))
        seen_keys = seen.select("url_hash").withColumn("seen_hit", F.lit(True))
        if self.use_bloom and self._bloom is not None:
            new_def, maybe = split_by_bloom(
                candidates_for_seen,
                "url_hash",
                self._bloom,
                self.spark,
                scratch=self._scratch,
            )
            checked = maybe.join(seen_keys, "url_hash", "left").withColumn(
                "seen_hit", F.coalesce(F.col("seen_hit"), F.lit(False))
            )
            flagged = new_def.withColumn("seen_hit", F.lit(False)).unionByName(
                checked
            )
        else:
            flagged = candidates_for_seen.join(
                seen_keys, "url_hash", "left"
            ).withColumn("seen_hit", F.coalesce(F.col("seen_hit"), F.lit(False)))
        _probe("gated", gated)
        annotated = flagged.unionByName(
            skipped_rows.withColumn("seen_hit", F.lit(False))
        ).cache()
        _probe("annotated", annotated)

        stats_row = annotated.agg(
            F.coalesce(F.sum("dups"), F.lit(0)).alias("n_valid"),
            F.count("*").alias("n_groups"),
            F.coalesce(F.sum(F.col("pass_cap").cast("long")), F.lit(0)).alias(
                "n_capped"
            ),
            F.coalesce(
                F.sum((F.col("pass_cap") & F.col("pass_robots")).cast("long")),
                F.lit(0),
            ).alias("n_gated"),
            F.coalesce(
                F.sum(
                    (
                        F.col("pass_cap")
                        & F.col("pass_robots")
                        & ~F.col("seen_hit")
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("n_admitted"),
        ).collect()[0]
        n_valid = int(stats_row["n_valid"])
        n_groups = int(stats_row["n_groups"])
        n_capped = int(stats_row["n_capped"])
        n_gated = int(stats_row["n_gated"])
        n_admitted = int(stats_row["n_admitted"])

        from ethereum_raw_data_crawler_spark.operators.priority_pop import (
            assign_global_seq,
        )

        admitted = assign_global_seq(
            annotated.where(
                F.col("pass_cap") & F.col("pass_robots") & ~F.col("seen_hit")
            ).drop("pass_cap", "pass_robots", "seen_hit", "dups"),
            ["url_canon"],
            "seq",
            approx_count=n_admitted,
            scratch=self._scratch,
        )

        rows = admitted.select(
            "url",
            "url_canon",
            "url_hash",
            "host",
            "priority",
            F.timestamp_seconds(
                F.lit(cfg.round_unix(rnd) + cfg.discovery_offset_s) + F.col("seq")
            ).alias("discovery_ts"),
            F.lit(STATUS_PENDING).alias("status"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit(None).cast("int").alias("skip_until"),
            F.lit(rnd).cast("int").alias("round"),
            F.lit(None).cast("int").alias("partition_id"),
        )
        stats = {
            "discovered": n_admitted,
            "robots_filtered": n_capped - n_gated,
            "deduped": (n_valid - n_groups)
            + (n_groups - n_capped)
            + (n_gated - n_admitted),
        }
        self._scratch.append(annotated)
        return rows, stats

    def _drain_scratch(self) -> None:
        for df in self._scratch:
            df.unpersist()
        self._scratch.clear()

    def _seed(self, seeds: DataFrame) -> None:
        """Round-0 discovery of the seed list (reference: StartBlock seeding,
        crawler_service.go:206-223)."""
        empty_seen = self.spark.createDataFrame([], SEEN)
        rows, stats = self._discover(
            seeds.select("url", F.col("priority").cast("int")), 0, empty_seen
        )
        rows = rows.cache()
        txn = self.store.transaction(0)
        txn.overwrite("frontier", rows)
        new_seen = rows.select(
            "url_hash", "url_canon", F.lit(0).cast("int").alias("first_seen_round")
        )
        txn.append("seen", new_seen)
        txn.commit()
        self._bloom_add_from_seen_fragment(0)
        rows.unpersist()
        self._drain_scratch()

    def _bloom_rebuild_spark(
        self, expected_keys: int | None = None
    ) -> "PartitionedBloom | PartitionedCuckoo":
        """Rebuild the partitioned bitmaps from the seen table — one Spark
        job (repartition keys by bucket, each task writes its buckets'
        bitmap files); the driver only sees per-bucket stat rows. Sized
        from the actual seen cardinality (parquet footer row counts, no
        data read) with 2x headroom."""
        frags = self.store.manifest()["tables"]["seen"]["fragments"]
        if expected_keys is None:
            expected_keys = 2 * max(self.store.fragment_rows(frags), 1)
        pb = self._filter_cls.create(
            self.store.root,
            n_buckets=self.bloom_buckets,
            expected_keys=expected_keys,
            rnd=self.store.round if frags else -1,
        )
        if frags:
            pb.add_keys(self.seen().select("url_hash"), "url_hash", self.store.round)
        return pb

    def _bloom_add_from_seen_fragment(self, rnd: int) -> None:
        """OR the just-committed seen fragment into the bucket bitmaps —
        a Spark job over the fragment's keys (executor-side file folds,
        only per-bucket counters reach the driver). Buckets past their
        design capacity (saturation -> FPR collapse) are rebuilt alone at
        their next size from the seen table."""
        if not self.use_bloom or self._bloom is None:
            return
        frags = [
            f
            for f in self.store.manifest()["tables"]["seen"]["fragments"]
            if f["seq"] == rnd
        ]
        if not frags or self.store.fragment_rows(frags) == 0:
            # nothing discovered this round: keep the bloom meta's round in
            # step with the table (crash catch-up compares the two) without
            # paying an empty fold job
            self._bloom._write_meta(rnd)
            return
        keys = self.store._read_fragments(self.spark, frags, SEEN).select("url_hash")
        saturated = self._bloom.add_keys(keys, "url_hash", rnd)
        if saturated:
            self._bloom.grow_buckets(
                self.seen().select("url_hash"), "url_hash", rnd, saturated
            )

    # ------------------------------------------------------------- one round
    def run_round(self, rnd: int) -> dict:
        cfg = self.cfg
        t0 = time.monotonic()
        phases: dict[str, int] = {}
        _last = [t0]

        def tick(name: str) -> None:
            now = time.monotonic()
            phases[name] = int((now - _last[0]) * 1000)
            _last[0] = now

        # health-ACTED recovery, applied LAZILY at the next round start
        # (reference: performHealthCheck observes, the recovery acts on the
        # next cycle, crawler_service.go:820-907): if the delete debt the
        # previous round's gauge recorded is a sizable fraction of the base
        # rows, rewrite the frontier NOW — the rewrite immediately pays for
        # itself in this round's pop read, and a crawl that ENDED on a
        # debt-heavy round never pays an O(frontier) rewrite it would never
        # benefit from. The transaction commits under the LAST completed
        # round so a crash between this compaction and this round's commit
        # resumes at this round, not past it. Footer row counts only — no
        # Spark job when the debt is below threshold.
        t_frontier = self.store.manifest()["tables"]["frontier"]
        if t_frontier["deletes"]:
            base_rows = self.store.fragment_rows(t_frontier["fragments"])
            debt_rows = self.store.fragment_rows(t_frontier["deletes"])
            if base_rows and debt_rows >= self.compact_debt_frac * base_rows:
                self.store.compact(self.spark, "frontier", FRONTIER, rnd - 1)
        tick("precompact")

        frontier = self.frontier()
        eligible = frontier.where(
            (F.col("status") == STATUS_PENDING)
            & (F.col("skip_until").isNull() | (F.col("skip_until") <= F.lit(rnd)))
        )
        politeness = self._dim("politeness", POLITENESS)
        popped = pop_batch(
            eligible,
            politeness,
            cfg.batch_size,
            cfg.default_budget,
            prune=self.prune_pop,
            scratch=self._scratch,
        )
        # small-k pops come off a driver TakeOrdered (no upstream cache) —
        # cache them; large-k pops are a cheap map over the range-sorted
        # partitioning assign_global_seq already cached in scratch, so a
        # second 10^7-row materialization here would only burn memory
        if cfg.batch_size <= 100_000:
            popped = popped.cache()
        # one job: popped count + the corpus buckets it hashes into
        bucket_counts = (
            popped.groupBy(
                F.pmod("url_hash", F.lit(self.n_buckets)).cast("int").alias("bucket")
            )
            .count()
            .collect()
        )
        n_popped = int(sum(r["count"] for r in bucket_counts))
        tick("pop")

        # ---- fetch: partition-pruned corpus join + failure injection ------
        if n_popped:
            buckets = sorted(r["bucket"] for r in bucket_counts)
            corpus_sel = self.store.read(
                self.spark,
                "corpus",
                CORPUS,
                partition_filter=f"bucket in ({','.join(map(str, buckets))})",
            ).select("url_canon", "warc_ts", "html", "lang")
            failures = self._dim("fetch_failures", FETCH_FAILURES)
            # small pops broadcast (no corpus shuffle); large pops would
            # serialize on the driver-side broadcast build — shuffle both
            # sides, but pin the physical strategy to a SHUFFLED HASH join
            # with the slim popped batch as build side: the default
            # sort-merge plan SORTS the corpus side, and at 20M rows that
            # side carries the html payload (~40 GB through sort buffers).
            # Hashing the slim side instead skips that entirely — measured
            # on the 20M fetch-join shape, 16 alternating legs in one
            # session: SHJ wins 6/8 adjacent pairs, min 10.8 s vs 15.6 s,
            # median 24.9 s vs 33.4 s (BENCH/BASELINE.md round 5). The
            # build side must stay bounded by DATA volume, not cluster
            # width: at the configured shuffle width alone a narrow
            # cluster (or local[2]) gets batch/width-row hash builds —
            # measured 4x+ round blowup at 20M popped / 2 partitions
            # (10M-row builds thrash GC). Widening the exchange so each
            # build holds <= SHJ_BUILD_ROWS slim rows keeps every
            # executor's hash map at low hundreds of MB no matter how
            # many executors the job happens to get; the explicit
            # repartition IS the join's exchange (it satisfies the hash
            # distribution), so wide clusters pay nothing extra.
            # SPARK_GRAFT_FETCH_JOIN=smj restores the optimizer-chosen
            # sort-merge plan — a deploy-time escape hatch (and the A/B
            # instrument used to adjudicate the hint's interaction with
            # the parse cache under memory pressure).
            if n_popped <= 100_000:
                popped_side = F.broadcast(popped)
            elif os.environ.get("SPARK_GRAFT_FETCH_JOIN", "shj") == "smj":
                popped_side = popped
            else:
                width = shj_width(
                    n_popped,
                    int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                )
                popped_side = popped.repartition(width, "url_canon").hint(
                    "shuffle_hash"
                )
            hits = (
                corpus_sel.join(popped_side, "url_canon", "inner")
                .join(F.broadcast(failures), "url_canon", "left")
                .withColumn("attempt", F.col("retry_count") + 1)
                .withColumn(
                    "fetch_failed",
                    F.coalesce(
                        F.array_contains(F.col("fail_attempts"), F.col("attempt")),
                        F.lit(False),
                    ),
                )
                .withColumn("partition_id", F.spark_partition_id())
            )
            # batch-size-gated materialization strategy: below ~2M popped
            # rows the html of the hit set fits executor memory twice, and
            # caching hits means the failed/miss branches and the parse
            # all reuse one corpus join (the fast small-batch plan). Above
            # that, a second multi-GB html cache is what made 32
            # concurrent tasks spill where 8 did not — leave hits lazy and
            # let the failed/miss branches recompute SLIM (column pruning
            # keeps html out of those scans).
            if n_popped <= self.HITS_CACHE_MAX:
                hits = hits.cache()
            hit_keys = hits.select("url_canon")
            if n_popped <= 100_000:
                hit_keys = F.broadcast(hit_keys)
            misses = popped.join(hit_keys, "url_canon", "left_anti").withColumn(
                "fetch_failed", F.lit(True)
            )
            fetched = hits.where(~F.col("fetch_failed"))
            # error_class rides along for the class-specific backoff;
            # misses (URL absent from the corpus) have no class -> default
            failed = (
                hits.where(F.col("fetch_failed"))
                .select(*[f.name for f in FRONTIER.fields], "error_class")
                .unionByName(
                    misses.select(
                        *[f.name for f in FRONTIER.fields]
                    ).withColumn("error_class", F.lit(None).cast("string"))
                )
            )
        else:
            hits = self.spark.createDataFrame(
                [],
                T.StructType(
                    list(FRONTIER.fields)
                    + [
                        T.StructField("pop_seq", T.LongType(), False),
                        T.StructField("warc_ts", T.TimestampType(), True),
                        T.StructField("html", T.BinaryType(), True),
                        T.StructField("lang", T.StringType(), True),
                        T.StructField("fetch_failed", T.BooleanType(), False),
                    ]
                ),
            )
            fetched = hits.where(~F.col("fetch_failed"))
            failed = self.spark.createDataFrame(
                [],
                T.StructType(
                    list(FRONTIER.fields)
                    + [T.StructField("error_class", T.StringType(), True)]
                ),
            )

        # the round's heavy materialization: the fetched rows with their
        # parse results. html crosses the Arrow socket once and is cached
        # once. Whether hits was ALSO cached is the HITS_CACHE_MAX gate
        # above: small batches reuse one corpus join everywhere, large
        # batches recompute the slim branches instead of spilling a second
        # 10^7-row html cache.
        extracted_base = fetched.withColumn(
            "ext", extract_page_udf("html", "url_canon")
        ).cache()
        # one job: materialize fetch+parse AND the per-partition lineage
        part_counts = (
            extracted_base.groupBy("partition_id")
            .agg(F.count("*").alias("fetched"))
            .collect()
        )
        n_fetched = int(sum(r["fetched"] for r in part_counts))
        n_errors = n_popped - n_fetched
        tick("fetch")

        from ethereum_raw_data_crawler_spark.operators.priority_pop import (
            assign_global_seq,
        )

        # fetch_seq = dense rank of pop_seq among fetched rows. pop_seq is
        # already a dense 0..n_popped-1 sequence, so the rank of a fetched
        # row is pop_seq minus the number of FAILED rows popped before it:
        #   * no errors (the production common case): fetch_seq = pop_seq,
        #     zero extra jobs, zero driver bytes;
        #   * few errors: collect only the failed pop_seqs (bounded by the
        #     error count, not the batch) and subtract map-side via
        #     searchsorted — html never moves, the broadcast is tiny;
        #   * degenerate (>2M errors AND >2M fetched): fully distributed
        #     two-pass numbering (one slim-column range sort, cached).
        if n_fetched and n_errors == 0:
            extracted = extracted_base.withColumn("seq", F.col("pop_seq"))
        elif n_fetched and n_errors <= 2_000_000:
            import numpy as np

            failed_seqs = np.sort(
                hits.where(F.col("fetch_failed"))
                .select("pop_seq")
                .unionByName(misses.select("pop_seq"))
                .toPandas()["pop_seq"]  # Arrow path: one slim int64 column
                .to_numpy(dtype=np.int64)
            )
            bc_seqs = self.spark.sparkContext.broadcast(failed_seqs)

            # scalar pandas UDF: ONLY pop_seq crosses the Arrow socket
            # (a mapInPandas here would ship html+text along for the ride)
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("long")
            def _rank(p: pd.Series) -> pd.Series:
                pv = p.to_numpy(dtype=np.int64)
                return pd.Series(pv - np.searchsorted(bc_seqs.value, pv))

            extracted = extracted_base.withColumn("seq", _rank("pop_seq"))
        else:
            extracted = assign_global_seq(
                extracted_base,
                ["pop_seq"],
                "seq",
                approx_count=n_fetched if n_fetched <= 200_000 else None,
                scratch=self._scratch,
            )
        pages_out = extracted.select(
            F.col("url_canon").alias("url"),
            "warc_ts",
            "html",
            F.col("ext.text").alias("text"),
            "lang",
            F.lit(rnd).cast("int").alias("fetch_round"),
            F.col("seq").alias("fetch_seq"),
        )

        # ---- outlink discovery (links arrive canonical + per-doc deduped) --
        seen_now = self.seen()
        outlinks = extracted.select(
            F.explode("ext.links").alias("url_canon"),
            (F.col("priority") + 1).cast("int").alias("priority"),
        ).withColumn("url", F.col("url_canon"))
        discovered, disc_stats = self._discover(outlinks, rnd, seen_now)
        discovered = discovered.cache()
        tick("discover")

        # ---- frontier bookkeeping (scheduler_service.go:324-357) ----------
        fetched_upd = extracted.select(
            "url",
            "url_canon",
            "url_hash",
            "host",
            "priority",
            "discovery_ts",
            F.lit(STATUS_FETCHED).alias("status"),
            "retry_count",
            F.col("skip_until").cast("int").alias("skip_until"),
            F.lit(rnd).cast("int").alias("round"),
            F.col("partition_id").cast("int").alias("partition_id"),
        )
        # class-specific backoff (reference: isRetryableError +
        # per-class schedules, ethereum_service.go:100-124,594-624):
        #   non_retryable -> failed immediately (no retry budget burned on
        #                    a 404/parse error that can never succeed);
        #   rate_limit    -> quadratic skip per failure, capped (attempt^2
        #                    seconds recast in rounds) — a 429-ing host
        #                    backs off harder each time;
        #   default       -> the linear machine (skip_rounds once past
        #                    max_retries), scheduler_service.go:324-357.
        new_rc = F.col("retry_count") + 1
        is_rl = F.col("error_class") == F.lit("rate_limit")
        is_nr = F.col("error_class") == F.lit("non_retryable")
        dead = is_nr | (new_rc >= cfg.hard_fail_retries)
        failed_upd = failed.select(
            "url",
            "url_canon",
            "url_hash",
            "host",
            "priority",
            "discovery_ts",
            F.when(dead, F.lit(STATUS_FAILED))
            .otherwise(F.lit(STATUS_PENDING))
            .alias("status"),
            new_rc.cast("int").alias("retry_count"),
            F.when(dead, F.col("skip_until"))
            .when(
                is_rl,
                F.lit(rnd)
                + F.least(new_rc * new_rc, F.lit(cfg.rate_limit_skip_cap)),
            )
            .when(new_rc >= cfg.max_retries, F.lit(rnd + cfg.skip_rounds))
            .otherwise(F.col("skip_until"))
            .cast("int")
            .alias("skip_until"),
            F.lit(rnd).cast("int").alias("round"),
            # lineage: partition_id = "the fetch-job partition that produced
            # this row's bytes". Failed/missed rows produced none — NULL,
            # like discovered rows. (Taking spark_partition_id() from the
            # failed branch's re-evaluation would record a DIFFERENT job's
            # layout than the fetched rows' cached one — inconsistent
            # lineage under AQE; misses would carry a stale prior-round id.)
            F.lit(None).cast("int").alias("partition_id"),
        )
        # zero-error rounds (the production common case, and provable here
        # from counts already in hand): the failed/miss branches are empty,
        # and UNIONing them anyway would re-evaluate the corpus join twice
        # (slim, but ~20-30 s each at 20M popped) just to append no rows —
        # measured as the bulk of a 70 s commit_frontier phase at 20M.
        if n_errors:
            frontier_new = fetched_upd.unionByName(failed_upd).unionByName(
                discovered
            )
        else:
            frontier_new = fetched_upd.unionByName(discovered)
        # small pops: collect delete keys driver-side (no Spark write job);
        # large pops: keep them distributed
        if n_popped <= 200_000:
            delete_keys = popped.select("url_canon").toPandas()
        else:
            delete_keys = popped.select("url_canon")

        # ---- per-(round, partition) lineage metrics ------------------------
        wall_ms = int((time.monotonic() - t0) * 1000)
        metrics_rows = [
            (
                rnd,
                int(r["partition_id"]) if r["partition_id"] is not None else -1,
                0,
                int(r["fetched"]),
                0,
                0,
                0,
                0,
            )
            for r in part_counts
        ]
        # round-level aggregates ride on partition_id = -1
        metrics_rows.append(
            (
                rnd,
                -1,
                n_popped,
                n_fetched,
                disc_stats["deduped"],
                disc_stats["robots_filtered"],
                n_errors,
                wall_ms,
            )
        )
        metrics_pdf = pd.DataFrame(
            metrics_rows, columns=[f.name for f in METRICS.fields]
        )

        # ---- single atomic commit (publish-after-save ordering) -----------
        new_seen = discovered.select(
            "url_hash", "url_canon", F.lit(rnd).cast("int").alias("first_seen_round")
        )

        # cheap per-round deltas are O(batch_size); size their output files
        # accordingly. pages_out is NOT coalesced: its write stage computes
        # the text extraction, and narrowing it below the core count would
        # serialize the hottest stage of the round.
        def parts(n: int, per: int = 100_000) -> int:
            return max(1, min(64, n // per + 1))

        # component-health snapshot (reference: performHealthCheck,
        # crawler_service.go:666-907) — gauges already in hand, no extra job
        err_frac = (n_errors / n_popped) if n_popped else 0.0
        sat = (
            self._bloom.estimated_saturation() if self._bloom is not None else 0.0
        )
        # frontier delete DEBT RATIO after this commit: (debt before + this
        # round's delete fragment) / (base rows after this commit), both
        # sides from parquet footers + counts already in hand — no job.
        # This gauge is ACTED on at the START of the next round (see
        # run_round's precompact): past compact_debt_frac the frontier is
        # rewritten before the next pop reads it. Relative, so a round's
        # debt only triggers an O(frontier) rewrite when it is actually
        # worth O(frontier) — never every round at production scale.
        tf = self.store.manifest()["tables"]["frontier"]
        debt_rows = self.store.fragment_rows(tf["deletes"]) + n_popped
        base_rows = (
            self.store.fragment_rows(tf["fragments"])
            + n_popped
            + disc_stats["discovered"]
        )
        debt_ratio = (debt_rows / base_rows) if base_rows else 0.0
        health_rows = [
            (rnd, "store", True, float(self.store.manifest()["version"]), "manifest version"),
            (rnd, "bloom", sat < 0.5, float(sat), "bitmap saturation"),
            (rnd, "fetch", err_frac < 0.5, float(err_frac), "error fraction"),
            (rnd, "scheduler", True, float(wall_ms), "round wall ms"),
            (rnd, "frontier", debt_ratio < self.compact_debt_frac,
             float(debt_ratio), "frontier delete debt / base rows"),
        ]
        health_pdf = pd.DataFrame(health_rows, columns=[f.name for f in HEALTH.fields])

        # per-sink timers inside the commit phase (writes are eager, the
        # manifest swap is last): phases_ms carries the split so a slow
        # commit is attributable to a sink, not guessed at
        def timed(name: str, fn) -> None:
            t = time.monotonic()
            fn()
            phases[f"commit_{name}"] = int((time.monotonic() - t) * 1000)

        txn = self.store.transaction(rnd)
        timed("pages", lambda: txn.append("pages_out", pages_out))
        if disc_stats["discovered"]:
            # a discovery-free round (fully-seeded production shape) skips
            # the empty fragment AND its write job
            timed(
                "seen",
                lambda: txn.append(
                    "seen", new_seen.coalesce(parts(disc_stats["discovered"]))
                ),
            )
        txn.append_pandas("metrics", metrics_pdf, METRICS)
        if "health" in txn.manifest["tables"]:  # stores created pre-§10
            txn.append_pandas("health", health_pdf, HEALTH)
        if (
            self.track_host_graph
            and n_fetched
            and "host_edges" in txn.manifest["tables"]  # stores pre-§11
        ):
            # host-level link-graph delta for this round: O(outlinks) with
            # map-side combine (host pairs repeat heavily within a
            # partition), grouped down to ~|hosts|^epsilon rows before the
            # shuffle. Only host + links are read back out of the cached
            # parse — html never moves. Self-host edges carry no authority
            # signal and are dropped (standard host-graph practice).
            edges_rnd = (
                extracted.select(
                    F.col("host").alias("src_host"),
                    F.explode("ext.links").alias("dst"),
                )
                .withColumn(
                    "dst_host",
                    F.regexp_extract("dst", r"^https?://([^/]+)/", 1),
                )
                .where(
                    (F.col("dst_host") != "")
                    & (F.col("dst_host") != F.col("src_host"))
                )
                .groupBy("src_host", "dst_host")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    "src_host",
                    "dst_host",
                    "n",
                    F.lit(rnd).cast("int").alias("round"),
                )
            )
            timed(
                "host_graph",
                lambda: txn.append(
                    "host_edges", edges_rnd.coalesce(parts(n_fetched))
                ),
            )
        timed(
            "frontier",
            lambda: txn.upsert(
                "frontier",
                "url_canon",
                frontier_new.coalesce(parts(n_popped + disc_stats["discovered"])),
                delete_keys,
            ),
        )
        txn.commit()
        timed("bloom", lambda: self._bloom_add_from_seen_fragment(rnd))
        tick("commit")
        if self._egress is not None:
            # strictly after the manifest swap (publish-after-save,
            # crawler_service.go:592-607): reads the COMMITTED snapshot
            self._egress.emit_round(self.spark, self.store, rnd)
            tick("egress")

        # scheduled compaction only (rnd % compact_every). The
        # health-triggered compaction is handled lazily at the start of
        # the NEXT round (precompact above) so a crawl's final round — or
        # a benchmark's only round — never pays an O(frontier) rewrite
        # whose benefit nobody reads.
        if self.compact_every and rnd % self.compact_every == 0:
            self.store.compact(self.spark, "frontier", FRONTIER, rnd)
        tick("compact")

        for df in (popped, hits, extracted_base, discovered):
            df.unpersist()  # no-op for never-cached frames (large-k popped,
            # large-batch hits)
        self._drain_scratch()
        return {
            "round": rnd,
            "popped": n_popped,
            "fetched": n_fetched,
            "errors": n_errors,
            **disc_stats,
            "wall_ms": wall_ms,
            "phases_ms": phases,
        }

    def cleanup_metrics(self, keep_last_rounds: int = 100) -> int:
        """Metrics retention (reference: CleanupOldMetrics,
        metrics_repository_impl.go:307-325): drop metrics fragments older
        than ``keep_last_rounds`` rounds. Fragment-granular (Iceberg
        expire-snapshots style), no row rewrite."""
        cutoff = self.store.round - keep_last_rounds
        return self.store.prune_fragments("metrics", cutoff, self.store.round)

    # -------------------------------------------------- link-authority rescore
    def rescore_priorities(
        self,
        top_frac: float = 0.10,
        damping: float = 0.85,
        iterations: int = 8,
        boost: int = 1,
    ) -> dict:
        """Re-prioritize pending frontier rows by crawl-discovered link
        authority: PageRank over the accumulated host_edges graph
        (operators/linkrank.py), then lower ``priority`` (= fetch sooner)
        by ``boost`` for pending URLs on the top ``top_frac`` of hosts.

        This is the COMPUTED version of the reference's static priority
        field (scheduler_service.go:251-307 pops by priority; here the
        priority itself is learned from the link graph the crawl built —
        CommonCrawl-style centrality-driven frontier scheduling).

        Maintenance op, run BETWEEN rounds; commits one frontier MOR
        upsert at round ``store.round + 1`` (its own snapshot — time
        travel across a rescore works like any other commit; the slot is
        consumed so the upsert's delete fragment can never collide with
        same-round data rows, whose MOR resolution is ``_seq >= del_seq``).

        Scale shape: the host graph is hosts², not URLs² — slim strings
        through pagerank's cached edge join; top-k selection is the same
        distributed two-pass numbering the large-k pop uses (never a
        single-partition window); the frontier update is one bounded MOR
        upsert, and only rows whose priority actually changes are
        rewritten. Determinism: float rank sums jitter at ~1e-15 across
        partitionings, so all ordering happens on parts-per-billion
        integers (the same discipline as the link_pagerank query oracle).
        """
        import math

        from ethereum_raw_data_crawler_spark.operators.linkrank import pagerank
        from ethereum_raw_data_crawler_spark.operators.priority_pop import (
            assign_global_seq,
        )

        # unweighted host graph: one edge per distinct (src, dst) pair —
        # per-round fragments re-observe the same pair, distinct folds them
        edges = self.host_edges().select("src_host", "dst_host").distinct()
        ranks = pagerank(
            edges, "src_host", "dst_host", damping=damping, iterations=iterations
        )
        ranks = ranks.select(
            "node",
            (-F.round(F.col("rank") * 1e9).cast("long")).alias("neg_ppb"),
        )
        n_hosts = ranks.count()
        if n_hosts == 0:
            return {"hosts": 0, "top_k": 0, "boosted": 0, "round": None}
        k = max(1, int(math.ceil(top_frac * n_hosts)))
        top = (
            assign_global_seq(
                ranks,
                ["neg_ppb", "node"],
                "pos",
                approx_count=n_hosts,
                scratch=self._scratch,
            )
            .where(F.col("pos") < F.lit(k))
            .select(F.col("node").alias("host"))
        )
        if k <= 1_000_000:
            top = F.broadcast(top)

        boosted = (
            self.frontier()
            .where((F.col("status") == STATUS_PENDING) & (F.col("priority") > 0))
            .join(top, "host")
            .withColumn(
                "priority",
                F.greatest(F.lit(0), F.col("priority") - F.lit(int(boost))).cast(
                    "int"
                ),
            )
            .select(*[f.name for f in FRONTIER.fields])
            .localCheckpoint(eager=True)  # one computation feeds count +
            # delete keys + new rows; checkpoint instead of cache so the
            # upsert's two write jobs can't race a lazy re-evaluation
        )
        n_boosted = boosted.count()
        rnd = self.store.round + 1
        if n_boosted:
            txn = self.store.transaction(rnd)
            txn.upsert(
                "frontier",
                "url_canon",
                boosted.coalesce(max(1, min(64, n_boosted // 100_000 + 1))),
                boosted.select("url_canon"),
            )
            txn.commit()
        self._drain_scratch()
        return {"hosts": n_hosts, "top_k": k, "boosted": n_boosted,
                "round": rnd if n_boosted else None}

    # ------------------------------------------------------------- the loop
    def pending_count(self) -> int:
        return self.frontier().where(F.col("status") == STATUS_PENDING).count()

    def eligible_count(self, rnd: int) -> int:
        """Pending rows that round ``rnd`` would actually pop — the
        pending count minus rows inside a retry-skip window
        (scheduler_service.go:291-303's eligibility gate)."""
        return (
            self.frontier()
            .where(
                (F.col("status") == STATUS_PENDING)
                & (
                    F.col("skip_until").isNull()
                    | (F.col("skip_until") <= F.lit(rnd))
                )
            )
            .count()
        )

    def run(self, max_rounds: int | None = None) -> list[dict]:
        """Round loop (reference: crawlerWorker ticker, crawler_service.go:
        229-248 — a driver for-loop in batch mode). Stops when the frontier
        is exhausted."""
        out = []
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        rnd = self.store.round
        # pre-round exhaustion check, mirroring the oracle's break: a crawl
        # that ends by exhaustion must NOT execute (and commit) one extra
        # empty round. The exact pending count is only paid when the last
        # round could have exhausted the frontier — any round that
        # discovered new URLs leaves them pending, so it cannot have.
        may_be_exhausted = True  # unknown at (re)entry
        while rnd < limit:
            if may_be_exhausted and self.pending_count() == 0:
                break
            rnd += 1
            stats = self.run_round(rnd)
            out.append(stats)
            may_be_exhausted = stats["discovered"] == 0
        return out
