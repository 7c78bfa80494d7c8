"""PageRank operator vs a single-threaded power-iteration oracle."""

import random

from ethereum_raw_data_crawler_spark.operators.linkrank import pagerank


def _oracle(edge_list, damping=0.85, iterations=8):
    nodes = sorted({u for e in edge_list for u in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in edge_list:
        outdeg[u] = outdeg.get(u, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        sums = {}
        for u, v in edge_list:
            sums[v] = sums.get(v, 0.0) + ranks[u] / outdeg[u]
        ranks = {
            v: (1.0 - damping) / n + damping * sums.get(v, 0.0) for v in nodes
        }
    return ranks


def _run(spark, edge_list, **kw):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_list], "src bigint, dst bigint"
    )
    got = pagerank(df.repartition(4), "src", "dst", **kw)
    return {int(r["node"]): float(r["rank"]) for r in got.collect()}


def test_star_and_sink(spark):
    # hub 0 -> {1..4}; all point back to 0; node 5 dangles off 4
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    edges += [(4, 5)]
    got = _run(spark, edges)
    want = _oracle(edges)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    # the hub outranks the dangling leaf
    assert got[0] > got[5]


def test_random_graph_matches_oracle(spark):
    rng = random.Random(42)
    n = 80
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(300)})
    # multi-edges and self-loops are part of the contract
    edges += edges[:10] + [(3, 3)]
    got = _run(spark, edges, iterations=5)
    want = _oracle(edges, iterations=5)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12

    # mass conservation bound: total rank <= 1 (dangling decay variant)
    assert sum(got.values()) <= 1.0 + 1e-9


def test_link_pagerank_query_matches_duckdb_oracle(spark):
    import duckdb

    from ethereum_raw_data_crawler_spark.queries import REGISTRY, _load_all

    _load_all()
    fn, sql = REGISTRY["link_pagerank"]
    sf = "/root/testdata/sf0.001"
    got = [(int(r["doc_id"]), int(r["rank_ppb"])) for r in fn(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = [(int(a), int(b)) for a, b in con.execute(sql).fetchall()]
    assert got == want
    assert len(got) > 0 and len({r for _, r in got}) > 1, "ranks should vary"
