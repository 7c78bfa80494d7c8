"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: a short crawl (2 rounds of
the frontier engine on the deterministic t1 synthetic corpus) returning
the ordered crawl trace — the engine's headline query ("given seed list S
and politeness budget B, which pages are fetched and in what order?",
SURVEY.md §7 Phase 1).

``queries()`` exposes every operator class from SURVEY.md §2 over the
driver's testdata tables plus the crawl-engine operators; ``oracle_sql()``
carries the DuckDB equivalents (crawl-engine ops are non-SQL-expressible
and get the driver's rows-only check; their exact-equality oracle lives in
tests/test_engine_oracle_equivalence.py).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_CRAWL_CACHE: dict = {}


def _crawl_store(spark: SparkSession):
    """Run a short deterministic crawl once per process; reuse the store."""
    key = "t1"
    if key not in _CRAWL_CACHE:
        from ethereum_raw_data_crawler_spark.config import CrawlConfig
        from ethereum_raw_data_crawler_spark.plans.rounds import CrawlEngine
        from ethereum_raw_data_crawler_spark.sources import synth

        # harness-owned session: right-size runtime-mutable knobs for a
        # tiny crawl (200 default shuffle partitions would be all overhead)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.session.timeZone", "UTC")

        tabs = synth.gen_all(synth.T1)
        relaxed = tabs["politeness"].copy()
        relaxed["budget_per_round"] = 50
        root = tempfile.mkdtemp(prefix="entry_crawl_")
        eng = CrawlEngine.create(
            spark,
            root,
            spark.createDataFrame(tabs["pages"]),
            spark.createDataFrame(tabs["seeds"]),
            spark.createDataFrame(tabs["robots"]),
            spark.createDataFrame(relaxed),
            spark.createDataFrame(tabs["fetch_failures"]),
            CrawlConfig(batch_size=400),
        )
        eng.run(max_rounds=2)
        _CRAWL_CACHE[key] = eng
    return _CRAWL_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 2 frontier rounds on the t1 corpus -> ordered crawl trace."""
    eng = _crawl_store(spark)
    return eng.read_trace().orderBy("round", "seq")


# ---- crawl-engine operators exposed as queries (rows-only checks) ---------


def _q_crawl_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _crawl_store(spark).read_trace().orderBy("round", "seq")


def _q_crawl_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_raw_data_crawler_spark.schemas import SEEN  # noqa: F401

    return _crawl_store(spark).seen().orderBy("url_hash")


def _q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _crawl_store(spark).frontier().orderBy("url_canon")


def _q_crawl_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_raw_data_crawler_spark.schemas import METRICS

    eng = _crawl_store(spark)
    return eng.store.read(spark, "metrics", METRICS).orderBy("round", "partition_id")


def _q_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over the synthetic corpus (pandas UDF path)."""
    from ethereum_raw_data_crawler_spark.functions.spark_udfs import (
        canonicalize_udf,
        url_hash_udf,
    )
    from ethereum_raw_data_crawler_spark.sources import synth

    pages = spark.createDataFrame(synth.gen_pages(synth.T1)[["url"]])
    return pages.select(
        "url",
        canonicalize_udf("url").alias("url_canon"),
        url_hash_udf(canonicalize_udf("url")).alias("url_hash"),
    ).orderBy("url")


def _q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical text extraction: engine text vs the corpus's stored
    expected text (match must be all-true)."""
    from ethereum_raw_data_crawler_spark.functions.spark_udfs import extract_text_udf
    from ethereum_raw_data_crawler_spark.sources import synth

    pages = spark.createDataFrame(synth.gen_pages(synth.T1))
    return pages.select(
        "url",
        (extract_text_udf("html") == F.col("text")).alias("text_matches"),
    ).orderBy("url")


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs over documents (exact-match oracle lives
    in tests/test_dedup_similarity.py — signature functions are shared
    with a pure-Python reference)."""
    from ethereum_raw_data_crawler_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, threshold=0.2).orderBy("id_a", "id_b")


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_raw_data_crawler_spark.operators.dedup import (
        simhash_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        simhash_fingerprints(docs)
        .where("chunk_idx = 0")
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    )


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_raw_data_crawler_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [
        float(x)
        for x in emb.where("vec_id = 0").select("embedding").first()["embedding"]
    ]
    return lsh_topk(emb, query, k=10, n_planes=4)


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_raw_data_crawler_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [
        float(x)
        for x in emb.where("vec_id = 0").select("embedding").first()["embedding"]
    ]
    return ivf_topk(emb, query, k=10, n_probe=6)


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ethereum_raw_data_crawler_spark.functions.multimodal import (
        extract_media_features,
        gen_media,
    )

    media = spark.createDataFrame(gen_media(200))
    return extract_media_features(media).orderBy("media_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ethereum_raw_data_crawler_spark.queries import spark_queries

    out = dict(spark_queries())
    out.update(
        {
            "crawl_trace": _q_crawl_trace,
            "crawl_seen": _q_crawl_seen,
            "crawl_frontier": _q_crawl_frontier,
            "crawl_metrics": _q_crawl_metrics,
            "canonicalize_urls": _q_canonicalize,
            "extract_text": _q_extract_text,
            "dedup_minhash_lsh": _q_minhash_lsh,
            "dedup_simhash": _q_simhash,
            "ann_lsh_topk": _q_ann_lsh,
            "ann_ivf_topk": _q_ann_ivf,
            "media_features": _q_media_features,
        }
    )
    return out


def oracle_sql() -> dict[str, str]:
    from ethereum_raw_data_crawler_spark.queries import oracle_sqls

    return dict(oracle_sqls())
