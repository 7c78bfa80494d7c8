"""Connected-components (dup-group resolution) vs a union-find oracle.

Covers the graph shapes that distinguish a correct distributed CC from a
lucky one: chains (worst case for naive label propagation — exercises the
O(log n) star alternation over many rounds), cliques (what near-dup
families actually look like), forests of mixed shapes, and random graphs.
"""

import random

import pytest
from pyspark.sql import functions as F

from ethereum_raw_data_crawler_spark.operators.components import (
    components_oracle,
    connected_components,
)


#: both execution paths must produce identical labelings: the default
#: (single-task vectorized union-find below the small-graph gate) and
#: the forced distributed star alternation (small_graph_max_edges=0)
PATHS = [8_000_000, 0]


def _run(spark, edge_list, parallelism=4, gate=8_000_000):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_list] or [(0, 0)],
        "src bigint, dst bigint",
    )
    if not edge_list:
        df = df.where(F.lit(False))
    got = connected_components(
        df.repartition(parallelism), "src", "dst", small_graph_max_edges=gate
    )
    return {int(r["node"]): int(r["component"]) for r in got.collect()}


@pytest.mark.parametrize("gate", PATHS)
def test_chain_converges_to_global_min(spark, gate):
    # path 0-1-2-...-40: diameter 40, star alternation must still collapse
    # it to a single root (and in far fewer than max_iterations rounds)
    edges = [(i, i + 1) for i in range(40)]
    random.Random(7).shuffle(edges)
    got = _run(spark, edges, gate=gate)
    assert got == {i: 0 for i in range(41)}


@pytest.mark.parametrize("gate", PATHS)
def test_cliques_and_isolated_pairs(spark, gate):
    edges = []
    # three cliques over disjoint id ranges
    for base in (100, 200, 300):
        ids = [base + i for i in range(5)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges += [(7, 9), (9, 7), (9, 7)]  # duplicate + reversed edges
    got = _run(spark, edges, gate=gate)
    assert got == components_oracle(edges)
    assert got[104] == 100 and got[304] == 300 and got[9] == 7


@pytest.mark.parametrize("gate", PATHS)
def test_random_graphs_match_union_find(spark, gate):
    rng = random.Random(1234)
    for trial in range(3):
        n = 120
        m = rng.choice([60, 150, 400])
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _run(spark, edges, parallelism=rng.choice([1, 3, 8]), gate=gate)
        want = components_oracle(edges)
        # oracle keeps self-loop-only nodes too (they are their own root)
        assert got == want, f"trial {trial} (m={m}) mismatch"


@pytest.mark.parametrize("gate", PATHS)
def test_empty_and_selfloop_only(spark, gate):
    assert _run(spark, [], gate=gate) == {}
    # self-loops: nodes appear in edges, map to themselves
    assert _run(spark, [(5, 5), (6, 6)], gate=gate) == {5: 5, 6: 6}


def test_small_and_distributed_paths_agree(spark):
    """The size gate is a pure execution-strategy switch: both paths must
    label a nontrivial mixed forest identically."""
    rng = random.Random(99)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    assert _run(spark, edges, gate=0) == _run(spark, edges, gate=8_000_000)


def test_np_components_matches_oracle():
    """The vectorized pointer-jumping kernel vs the dict union-find on a
    long chain (worst case for propagation depth) and random graphs."""
    import numpy as np

    from ethereum_raw_data_crawler_spark.operators.components import (
        _np_components,
    )

    rng = random.Random(5)
    cases = [[(i, i + 1) for i in range(500)]]
    for _ in range(3):
        cases.append(
            [(rng.randrange(300), rng.randrange(300)) for _ in range(1000)]
        )
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        u = np.array([a for a, _ in edges], dtype=np.int64)
        v = np.array([b for _, b in edges], dtype=np.int64)
        nodes, comp = _np_components(u, v)
        got = dict(zip(nodes.tolist(), comp.tolist()))
        assert got == components_oracle(edges)


def test_nonconvergence_guard(spark):
    df = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            df, "src", "dst", max_iterations=0, small_graph_max_edges=0
        )


def test_dedup_groups_query_matches_duckdb_oracle(spark):
    """The registered query vs its recursive-CTE oracle at sf0.001 —
    the same comparison the correctness driver runs at sf0.01."""
    import duckdb

    from ethereum_raw_data_crawler_spark.queries import REGISTRY, _load_all

    _load_all()
    fn, sql = REGISTRY["dedup_groups"]
    sf = "/root/testdata/sf0.001"
    got = [
        (int(r["doc_id"]), int(r["group_id"]), int(r["group_size"]), int(r["keep"]))
        for r in fn(spark, sf).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = [tuple(int(x) for x in row) for row in con.execute(sql).fetchall()]
    assert sorted(got) == sorted(want)
    assert len(got) > 0, "sf0.001 corpus should contain near-dup families"
