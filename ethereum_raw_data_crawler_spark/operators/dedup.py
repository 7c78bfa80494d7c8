"""Deduplication operators for the training-data pipeline.

Five families over the ``documents`` table, each the set-based analogue of
the reference's unique-index dedup (reference: mongodb.go:86-92,111-115)
generalized from exact keys to near-duplicate content:

  exact           hash-groupBy (queries.py::dedup_exact — SQL-paired)
  minhash_lsh     word-shingle MinHash -> banded LSH -> bucket self-join
                  -> signature-similarity verify
  simhash         64-bit SimHash fingerprints -> chunk-banded candidate
                  pairs -> Hamming verify
  ngram_jaccard   exact word-3-gram Jaccard over blocked pairs
                  (queries.py SQL-paired variant lives in queries registry)
  embedding_cos   near-dup pairs by cosine over the embedding column

Scale notes (10^10 docs): LSH banding turns the O(n^2) pair problem into
per-bucket self-joins; bucket sizes are bounded by hash dispersion, and
AQE skew-join splitting covers pathological buckets. Signatures are
computed in one Arrow-batched mapInPandas pass (numpy-vectorized per
document batch, no per-row Python UDF rows).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ethereum_raw_data_crawler_spark.functions.hashing import (
    band_keys,
    hamming64,
    minhash_signature,
    simhash64,
    token_hash64,
    word_shingles,
)

# ---------------------------------------------------------------------------
# pure per-document signature functions (shared with the pytest oracles)
# ---------------------------------------------------------------------------


def doc_minhash(text: str, k: int = 64) -> np.ndarray:
    hashes = np.array(
        [token_hash64(s) for s in word_shingles(text, 3)], dtype=np.uint64
    )
    return minhash_signature(hashes, k)


def doc_simhash(text: str) -> int:
    toks = [t for t in text.split(" ") if t]
    hashes = np.array([token_hash64(t) for t in toks], dtype=np.uint64)
    return simhash64(hashes)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_bands(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 64, bands: int = 16) -> DataFrame:
    """(id, band_idx, band_key, sig) — one row per (doc, band)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("band_idx", T.IntegerType(), False),
            T.StructField("band_key", T.LongType(), False),
            T.StructField("sig", T.ArrayType(T.LongType()), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sig = doc_minhash(text, k)
                sig_signed = sig.view(np.int64).tolist()
                for bi, bk in enumerate(band_keys(sig, bands)):
                    rows.append((int(did), bi, bk, sig_signed))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[id_col, "band_idx", "band_key", "sig"]
                )

    return df.select(id_col, text_col).mapInPandas(compute, out_schema)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified by signature
    similarity (fraction of equal MinHash entries — the unbiased Jaccard
    estimate). Returns (id_a, id_b, est_jaccard) with id_a < id_b."""
    b = minhash_bands(df, text_col, id_col, k, bands)
    left = b.select(
        F.col(id_col).alias("id_a"),
        "band_idx",
        "band_key",
        F.col("sig").alias("sig_a"),
    )
    right = b.select(
        F.col(id_col).alias("id_b"),
        "band_idx",
        "band_key",
        F.col("sig").alias("sig_b"),
    )
    pairs = (
        left.join(right, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(k)
    return (
        pairs.withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_lsh_pairs_oracle(
    pdf: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> set[tuple[int, int, float]]:
    """Single-threaded reference for the pytest oracle."""
    sigs = {int(r[id_col]): doc_minhash(r[text_col], k) for _, r in pdf.iterrows()}
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in sigs.items():
        for bi, bk in enumerate(band_keys(sig, bands)):
            buckets.setdefault((bi, bk), []).append(did)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = set()
    for a, b in cand:
        est = round(float((sigs[a] == sigs[b]).mean()), 6)
        if est >= threshold:
            out.add((a, b, est))
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash, 4x16-bit chunk keys) in one Arrow pass."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("chunk_key", T.IntegerType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sh = doc_simhash(text)
                for c in range(4):
                    rows.append((int(did), sh, c, (sh >> (16 * c)) & 0xFFFF))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[id_col, "simhash", "chunk_idx", "chunk_key"]
                )

    return df.select(id_col, text_col).mapInPandas(compute, out_schema)


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming. Pigeonhole
    blocking: distance <=3 over 4 chunks implies at least one identical
    16-bit chunk, so the candidate join is per-(chunk_idx, chunk_key)."""
    fp = simhash_fingerprints(df, text_col, id_col)
    left = fp.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sh_a"),
        "chunk_idx",
        "chunk_key",
    )
    right = fp.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sh_b"),
        "chunk_idx",
        "chunk_key",
    )
    return (
        left.join(right, ["chunk_idx", "chunk_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_dup_oracle(
    pdf: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> set[tuple[int, int, int]]:
    fps = {int(r[id_col]): doc_simhash(r[text_col]) for _, r in pdf.iterrows()}
    ids = sorted(fps)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = hamming64(fps[ids[i]], fps[ids[j]])
            if d <= max_hamming:
                out.add((ids[i], ids[j], d))
    return out
