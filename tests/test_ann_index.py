"""Materialized ANN index (the at-rest scale path): tag the embedding
corpus ONCE, write partitioned by the tag, answer queries with a
partition-pruned read + exact rerank. Results are bit-identical to the
inline per-query helpers (same seeds, same probe logic), and the
candidate scan provably touches ONLY the probed partitions — checked
physically via input_file_name(), not just the plan string."""

import os

from pyspark.sql import functions as F

from ethereum_raw_data_crawler_spark.operators.similarity import (
    AnnIndex,
    ivf_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.01"


def _query_vec(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.toPandas()
    return emb, [
        float(x) for x in pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0]
    ]


def _read_partitions(df, tag: str) -> set[int]:
    """Partition values of the files a query ACTUALLY reads."""
    files = {
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    }
    assert files
    out = set()
    for f in files:
        assert f"{tag}=" in f, f"unpartitioned file read: {f}"
        out.add(int(f.split(f"{tag}=")[1].split("/")[0]))
    return out


def test_lsh_index_matches_inline_and_prunes(spark, tmp_path):
    emb, query = _query_vec(spark)
    idx = AnnIndex.build_lsh(
        emb, str(tmp_path / "lsh"), dim=len(query), n_planes=4
    )
    got = [(r["vec_id"], r["cos_sim"]) for r in idx.topk(spark, query, k=10).collect()]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in lsh_topk(emb, query, k=10, n_planes=4).collect()
    ]
    assert got == want  # at-rest path ≡ inline path

    probes = set(idx.probes(query))
    read = _read_partitions(idx.candidates(spark, query), "bucket")
    assert read <= probes  # every file read belongs to a probed partition
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(idx.vdir, "data"))
        if d.startswith("bucket=")
    }
    # the index genuinely holds unprobed partitions that were NOT read
    assert on_disk - probes, "fixture too small to exercise pruning"
    assert read < on_disk
    # and the pruning happened at plan time (partition filters, not a
    # post-scan filter): the scan's partition count < total partitions
    plan = idx.candidates(spark, query)._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_ivf_index_matches_inline_and_prunes(spark, tmp_path):
    emb, query = _query_vec(spark)
    idx = AnnIndex.build_ivf(emb, str(tmp_path / "ivf"), n_lists=16)
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in idx.topk(spark, query, k=10, n_probe=6).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(emb, query, k=10, n_probe=6).collect()
    ]
    assert got == want  # identical quantizer sample + seeds

    probes = set(idx.probes(query, n_probe=6))
    assert len(probes) == 6
    read = _read_partitions(idx.candidates(spark, query, n_probe=6), "list_id")
    assert read <= probes
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(idx.vdir, "data"))
        if d.startswith("list_id=")
    }
    assert read < on_disk


def test_ivf_index_with_supplied_centroids_matches_and_prunes(spark, tmp_path):
    """The registered ann_ivf_indexed_topk path: build_ivf with the
    per-label-mean centroid matrix (the SQL-oracled quantizer) must
    assign, probe, and rerank identically to the inline per-label-mean
    query — through a partition-pruned read."""
    import numpy as np

    from ethereum_raw_data_crawler_spark.queries_pipeline import (
        _N_PROBE,
        _label_mean_centroids,
        ann_ivf_topk,
    )

    emb, query = _query_vec(spark)
    cents = _label_mean_centroids(emb)
    idx = AnnIndex.build_ivf(
        emb.where(F.col("vec_id") != 0), str(tmp_path / "ivfc"), centroids=cents
    )
    assert idx.meta["n_lists"] == cents.shape[0]
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in idx.topk(spark, query, k=10, n_probe=_N_PROBE).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in ann_ivf_topk(spark, SF).collect()
    ]
    assert got == want
    read = _read_partitions(
        idx.candidates(spark, query, n_probe=_N_PROBE), "list_id"
    )
    assert read <= set(idx.probes(query, n_probe=_N_PROBE))
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(idx.vdir, "data"))
        if d.startswith("list_id=")
    }
    assert read < on_disk  # genuinely pruned
    assert np.array_equal(idx.model, cents)  # quantizer persisted intact


def test_rebuild_commit_protocol_survives_mid_rebuild_crash(spark, tmp_path):
    """AnnIndex follows the store's snapshot commit discipline: a rebuild
    that dies anywhere before the pointer swap leaves the PRIOR index
    fully readable, and versions are time-travelable after a successful
    rebuild."""
    import pytest

    emb, query = _query_vec(spark)
    root = str(tmp_path / "versioned")
    idx1 = AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=4)
    assert idx1.version == 1
    want = [
        (r["vec_id"], r["cos_sim"]) for r in idx1.topk(spark, query, k=5).collect()
    ]

    # crash mid-rebuild: the data files of v2 are on disk but the commit
    # pointer was never swapped (np.save dies = any pre-publish failure)
    import numpy as np

    real_save = np.save

    def boom(*a, **k):
        raise RuntimeError("injected crash before publish")

    np.save = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=8)
    finally:
        np.save = real_save

    # a fresh reader (new-process analogue) still sees v1, bit-identical
    reopened = AnnIndex(root)
    assert reopened.version == 1
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in reopened.topk(spark, query, k=5).collect()
    ]
    assert got == want

    # a successful rebuild reclaims the orphaned, never-committed v2
    # (versions only advance at publish, so a committed version is never
    # reused and the half-written files are fully overwritten)...
    idx2 = AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=4)
    assert idx2.version == 2
    assert AnnIndex(root).version == 2
    # ...and v1 remains readable by explicit version = time travel
    old = AnnIndex(root, version=1)
    got_old = [
        (r["vec_id"], r["cos_sim"])
        for r in old.topk(spark, query, k=5).collect()
    ]
    assert got_old == want


def test_index_reopens_from_disk(spark, tmp_path):
    """The index is a durable artifact: a fresh AnnIndex(root) (new
    process analogue) answers identically to the builder's handle."""
    emb, query = _query_vec(spark)
    AnnIndex.build_lsh(emb, str(tmp_path / "l2"), dim=len(query), n_planes=4)
    idx2 = AnnIndex(str(tmp_path / "l2"))
    got = [
        (r["vec_id"], r["cos_sim"]) for r in idx2.topk(spark, query, k=5).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in lsh_topk(emb, query, k=5, n_planes=4).collect()
    ]
    assert got == want


def test_version_gc_keeps_two_and_reclaims_orphans(spark, tmp_path):
    """The mirror of PartitionedBloom._gc for the index: publishing keeps
    the newest TWO published versions (pointer + one step of time travel)
    and reclaims everything older, plus any unpublished orphan directory a
    crashed build left above the pointer."""
    import numpy as np
    import pytest

    emb, query = _query_vec(spark)
    root = str(tmp_path / "gc")
    AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=4)

    # crash mid-build -> orphan v-000002 sits above the pointer
    real_save = np.save
    np.save = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    try:
        with pytest.raises(RuntimeError, match="boom"):
            AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=8)
    finally:
        np.save = real_save
    assert os.path.isdir(os.path.join(root, "v-000002"))  # the leak

    # next successful build reclaims the orphan (reuses its number after
    # clearing the garbage) and publishes it
    AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=4)
    assert AnnIndex(root).version == 2

    # third build: keep=2 -> v1 is GC'd, v2 (time travel) + v3 survive
    idx3 = AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=4)
    assert idx3.version == 3
    vdirs = sorted(d for d in os.listdir(root) if d.startswith("v-"))
    assert vdirs == ["v-000002", "v-000003"]
    assert AnnIndex(root, version=2).topk(spark, query, k=3).count() == 3


def test_legacy_flat_layout_auto_migrates(spark, tmp_path):
    """An index persisted under the pre-versioning flat layout
    (meta.json/model.npy/data at the root, no current.json) opens
    transparently: AnnIndex(root) migrates it to v-000001 + pointer."""
    import shutil

    emb, query = _query_vec(spark)
    root = str(tmp_path / "legacy")
    idx = AnnIndex.build_lsh(emb, root, dim=len(query), n_planes=4)
    want = [
        (r["vec_id"], r["cos_sim"]) for r in idx.topk(spark, query, k=5).collect()
    ]
    # reshape to the old flat layout
    vdir = os.path.join(root, "v-000001")
    for name in ("data", "meta.json", "model.npy"):
        shutil.move(os.path.join(vdir, name), os.path.join(root, name))
    os.rmdir(vdir)
    os.unlink(os.path.join(root, "current.json"))

    migrated = AnnIndex(root)
    assert migrated.version == 1
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in migrated.topk(spark, query, k=5).collect()
    ]
    assert got == want


def _split_corpus(emb):
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    return base, delta


def test_lsh_append_equals_full_rebuild(spark, tmp_path):
    """append(delta) on an index built from the base corpus answers
    queries identically to a FULL rebuild over base ∪ delta (the frozen
    quantizer makes the assignments equal by construction), while doing
    O(batch) work: the inherited files are hard links (same inode), not
    copies."""
    emb, query = _query_vec(spark)
    base, delta = _split_corpus(emb)

    root_inc = str(tmp_path / "inc")
    idx = AnnIndex.build_lsh(base, root_inc, dim=len(query), n_planes=4)
    v1_files = {
        os.path.join(dp, f): os.stat(os.path.join(dp, f)).st_ino
        for dp, _, fs in os.walk(os.path.join(idx.vdir, "data"))
        for f in fs
        if f.endswith(".parquet")
    }
    idx2 = idx.append(delta)
    assert idx2.version == 2

    root_full = str(tmp_path / "full")
    full = AnnIndex.build_lsh(emb, root_full, dim=len(query), n_planes=4)

    got = [
        (r["vec_id"], r["cos_sim"]) for r in idx2.topk(spark, query, k=10).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"]) for r in full.topk(spark, query, k=10).collect()
    ]
    assert got == want
    # same total corpus behind the index
    assert (
        spark.read.parquet(os.path.join(idx2.vdir, "data")).count() == emb.count()
    )
    # O(batch): every base file was inherited by hard link, not rewritten
    inherited = {
        os.path.join(dp, f): os.stat(os.path.join(dp, f)).st_ino
        for dp, _, fs in os.walk(os.path.join(idx2.vdir, "data"))
        for f in fs
        if f.endswith(".parquet")
    }
    v1_inodes = set(v1_files.values())
    assert v1_inodes & set(inherited.values()) == v1_inodes


def test_ivf_append_equals_full_rebuild(spark, tmp_path):
    """Same append ≡ rebuild equivalence for the IVF kind, with an
    explicit (caller-supplied) quantizer so the full rebuild trains on
    nothing — both sides share the frozen centroid matrix."""
    import numpy as np

    emb, query = _query_vec(spark)
    base, delta = _split_corpus(emb)
    pdf = emb.orderBy("vec_id").select("embedding").limit(200).toPandas()
    train = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    from ethereum_raw_data_crawler_spark.operators.similarity import (
        kmeans_centroids,
    )

    cents = kmeans_centroids(train, k=8)

    idx = AnnIndex.build_ivf(base, str(tmp_path / "inc"), centroids=cents)
    idx2 = idx.append(delta)
    full = AnnIndex.build_ivf(emb, str(tmp_path / "full"), centroids=cents)

    got = [
        (r["vec_id"], r["cos_sim"])
        for r in idx2.topk(spark, query, k=10, n_probe=3).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in full.topk(spark, query, k=10, n_probe=3).collect()
    ]
    assert got == want
