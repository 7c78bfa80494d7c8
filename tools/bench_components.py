"""Scale microbench for the round-5 graph operators (connected
components + PageRank): deterministic synthetic graphs generated
Spark-side, one JSON line per run with wall seconds and iteration
counts, so BENCH/BASELINE.md can record how the O(log n) star
alternation and the per-iteration rank shuffle behave at millions of
edges (the shape a 100-TB dedup's pair graph actually has: huge node
count, near-clique families, bounded component size).

Usage: python tools/bench_components.py <cores> <n_nodes> [avg_deg]

Graph: node i -> (i * 2654435761 + j) % n for j in 1..avg_deg (Knuth
multiplicative mixing — no hot hub, like an LSH pair graph after
banding), PLUS a 1%-of-n chain 0-1-2-... to force multi-round
convergence (the worst case for naive propagation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    avg_deg = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from ethereum_raw_data_crawler_spark.operators.components import (
        connected_components,
    )
    from ethereum_raw_data_crawler_spark.operators.linkrank import pagerank
    from ethereum_raw_data_crawler_spark.session import get_spark

    spark = get_spark(
        cores=cores, shuffle_partitions=cores * 3, app_name=f"graphbench-{cores}"
    )
    ids = spark.range(n).select(F.col("id").alias("src"))
    parts = [
        ids.select(
            "src",
            ((F.col("src") * F.lit(2654435761) + F.lit(j)) % n).alias("dst"),
        )
        for j in range(1, avg_deg + 1)
    ]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.union(p)
    chain = (
        spark.range(max(n // 100, 2) - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    edges = edges.union(chain).localCheckpoint(eager=True)
    m = edges.count()

    t0 = time.monotonic()
    cc = connected_components(edges, "src", "dst")
    n_comp = cc.select("component").distinct().count()
    cc_wall = time.monotonic() - t0

    t0 = time.monotonic()
    pr = pagerank(edges, iterations=8)
    top = pr.agg(F.max("rank").alias("mx")).collect()[0]["mx"]
    pr_wall = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "nodes": n,
                "edges": m,
                "cc_wall_sec": round(cc_wall, 2),
                "cc_components": n_comp,
                "cc_edges_per_sec": round(m / cc_wall, 1),
                "pr_wall_sec": round(pr_wall, 2),
                "pr_iters": 8,
                "pr_edge_visits_per_sec": round(8 * m / pr_wall, 1),
                "pr_max_rank": top,
            }
        )
    )


if __name__ == "__main__":
    main()
