"""Similarity search over the embedding column (array<float>).

Two paths, as a 100-TB pipeline needs both:

  brute_force_topk   exact cosine top-k — the correctness baseline
                     (SQL-paired variant: queries.py::embedding_topk).
                     Built-in higher-order functions only (zip_with +
                     aggregate), whole-stage-codegen'd, no Python.

  lsh_topk           random-hyperplane LSH: bucket by sign bits, multi-
                     probe neighboring buckets (Hamming<=1), exact cosine
                     on the candidate set only. The scale path: candidate
                     count is ~n/2^p per probe instead of n.

Hyperplanes are seeded — the bucketing is deterministic, so results are
reproducible and the pytest recall check is stable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )


def cosine_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            id_col, F.round(cosine_col(F.col(vec_col), q), 5).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    return (bits * (1 << np.arange(planes.shape[0]))[None, :]).sum(axis=1)


def with_lsh_bucket(
    embeddings: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add the sign-bit bucket id — one vectorized Arrow pass."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(planes)
    schema = T.StructType(
        list(embeddings.schema.fields) + [T.StructField("bucket", T.LongType(), False)]
    )

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy())
            yield pdf.assign(bucket=_bucket_of(vecs, bc.value))

    return embeddings.mapInPandas(tag, schema)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: exact cosine restricted to the query's LSH bucket plus
    all Hamming-1 neighbor buckets (multi-probe). At scale the bucket
    column is a partition/bucketing key, so this is a partition-pruned
    scan + a small exact top-k instead of a full-corpus pass."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qb = int(_bucket_of(q[None, :], planes)[0])
    probes = [qb] + [qb ^ (1 << i) for i in range(n_planes)]
    tagged = with_lsh_bucket(embeddings, planes, id_col, vec_col)
    cand = tagged.where(F.col("bucket").isin(probes))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            id_col, F.round(cosine_col(F.col(vec_col), qcol), 5).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def lsh_topk_oracle(
    pdf: pd.DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[tuple[int, float]]:
    """Single-threaded reference of the same LSH procedure."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qb = int(_bucket_of(q[None, :], planes)[0])
    probes = {qb} | {qb ^ (1 << i) for i in range(n_planes)}
    out = []
    for _, r in pdf.iterrows():
        v = np.asarray(r[vec_col], dtype=np.float64)
        if int(_bucket_of(v[None, :], planes)[0]) not in probes:
            continue
        # float32-faithful dot (mirror Spark's float->double elementwise cast)
        v32 = np.asarray(r[vec_col])
        cos = float(
            sum(float(a) * float(b) for a, b in zip(v32, q))
            / (
                np.sqrt(sum(float(a) * float(a) for a in v32))
                * np.sqrt(sum(float(b) * float(b) for b in q))
            )
        )
        out.append((int(r[id_col]), round(cos, 5)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]
