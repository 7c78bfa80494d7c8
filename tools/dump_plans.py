"""Dump .explain('formatted') for named registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [name ...]
   -> plans/<tag>/<name>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ethereum_raw_data_crawler_spark.queries import spark_queries
    from ethereum_raw_data_crawler_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app_name="dump_plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    qs = spark_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
