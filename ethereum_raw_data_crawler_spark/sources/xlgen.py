"""Spark-parallel deterministic generator for the XL scaling corpus.

The pandas generator (sources/synth.py) is single-threaded — fine up to
~1M pages, too slow beyond. For the scaling-efficiency evidence we need
rounds big enough to amortize fixed per-round driver costs (exactly what
a production round at 10^10-frontier scale looks like), so this generator
builds an N-million-page corpus with Spark itself: content is a pure
function of the row id (seeded per-id numpy RNG), so the corpus is
deterministic regardless of partitioning.

Usage: python -m ethereum_raw_data_crawler_spark.sources.xlgen <n_pages> <out_dir> [hosts]
"""

from __future__ import annotations

import os
import sys
from typing import Iterator

import numpy as np
import pandas as pd

_WORDS = (
    "data spark crawl frontier fetch page host queue batch round robot "
    "budget retry token shuffle partition snapshot commit resume trace "
    "bloom filter anti join window rank priority seed link text parse"
).split()


def gen_partition(
    ids: np.ndarray, n_pages: int, hosts: int, seed: int
) -> pd.DataFrame:
    host = (ids % hosts + 1).astype(np.int64)  # uniform hosts (bench shape)
    page = ids // hosts
    urls = [f"https://host{h}.example/p/{p}" for h, p in zip(host, page)]
    htmls = []
    for i, u in zip(ids, urls):
        rng = np.random.default_rng(seed + int(i))
        words = " ".join(_WORDS[k] for k in rng.integers(0, len(_WORDS), 40))
        links = "".join(
            f'<a href="https://host{int(t) % hosts + 1}.example/p/{int(t) // hosts}">x</a>'
            for t in rng.integers(0, n_pages, rng.integers(0, 9))
        )
        htmls.append(
            f"<html><head><title>{u}</title></head><body>{words}{links}</body></html>".encode()
        )
    warc = pd.Series(
        pd.Timestamp("2025-01-01", tz="UTC") + pd.to_timedelta(ids * 7, unit="s")
    )
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc,
            "html": htmls,
            "text": "",  # engine never reads corpus.text
            "lang": "en",
        }
    )


def generate(spark, n_pages: int, out_dir: str, hosts: int = 1000, seed: int = 42) -> None:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_partition(
                pdf["id"].to_numpy(dtype=np.int64), n_pages, hosts, seed
            )

    os.makedirs(out_dir, exist_ok=True)
    ids = spark.range(0, n_pages, numPartitions=64)
    ids.mapInPandas(gen, schema).write.mode("overwrite").parquet(
        os.path.join(out_dir, "pages.parquet")
    )
    # dims: every host allowed, budget set by the bench at run time
    robots = pd.DataFrame(
        {
            "host": [f"host{h}.example" for h in range(1, hosts + 1)],
            "allowed": True,
            "disallow_prefix": None,
        }
    )
    politeness = pd.DataFrame(
        {
            "host": [f"host{h}.example" for h in range(1, hosts + 1)],
            "budget_per_round": np.int32(1000),
        }
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(robots, preserve_index=False),
        os.path.join(out_dir, "robots.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(politeness, preserve_index=False),
        os.path.join(out_dir, "politeness.parquet"),
    )
    # seeds: the full universe (frontier pre-populated, production shape)
    spark.range(0, n_pages, numPartitions=16).selectExpr(
        f"concat('https://host', cast(id % {hosts} + 1 as string), "
        f"'.example/p/', cast(id div {hosts} as string)) as url",
        "cast(0 as int) as priority",
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "seeds.parquet"))
    open(os.path.join(out_dir, "_DONE"), "w").write("ok")
    print("wrote", out_dir, n_pages, "pages")


def main() -> None:
    n_pages = int(sys.argv[1])
    out_dir = sys.argv[2]
    hosts = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    from ethereum_raw_data_crawler_spark.session import get_spark

    spark = get_spark(cores=32, shuffle_partitions=64, app_name="gen-xl")
    generate(spark, n_pages, out_dir, hosts)


if __name__ == "__main__":
    main()
