"""Round-13 IVF shard-store lifecycle (VERDICT r12 #2): atomic shard-id
claims under concurrent appenders, and ``compact_store`` — the re-fit +
dedup + crash-safe-swap remedy for ``ivf_store_audit``'s
``refit_recommended`` flag (mirroring the indexer's compact discipline).
"""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from dampr_spark.operators.similarity import IVFIndex, ivf_store_audit

VEC_SCHEMA = "vec_id long, embedding array<float>"


def _clustered(spark, n_clusters=8, per_cluster=50, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c % dim] = 1.0
        for i in range(per_cluster):
            v = center + 0.05 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((c * per_cluster + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, VEC_SCHEMA)


# ---------------------------------------------------------------------------
# atomic shard-id claims
# ---------------------------------------------------------------------------


def test_concurrent_appenders_never_clobber(spark, tmp_path):
    """Two appenders racing the same store must land on DISTINCT shard
    ids with both batches fully present (pre-r13 both could list max+1,
    claim the same id, and the overwrite silently dropped one batch)."""
    from concurrent.futures import ThreadPoolExecutor

    df = _clustered(spark)
    ivf = IVFIndex(n_lists=8, nprobe=3, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    base = df.filter(F.col("vec_id") % 3 == 0)
    b1 = df.filter(F.col("vec_id") % 3 == 1)
    b2 = df.filter(F.col("vec_id") % 3 == 2)
    ivf.init_store(base, root)
    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(ivf.append_shard, b1, root)
        f2 = ex.submit(ivf.append_shard, b2, root)
        s1, s2 = f1.result(), f2.result()
    assert s1 != s2, "two appenders claimed the same shard id"
    assert sorted(ivf.store_shard_ids(spark, root)) == sorted([0, s1, s2])
    store = ivf.read_store(spark, root)
    assert store.count() == df.count()
    assert store.select("vec_id").distinct().count() == df.count()


def test_claimed_but_unwritten_id_stays_burned(spark, tmp_path):
    """A claim marker without its shard dir (a writer that crashed after
    claiming) burns the id: the next appender skips it instead of
    half-overwriting the crashed writer's partial output."""
    df = _clustered(spark, n_clusters=4, per_cluster=20)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=200)
    root = str(tmp_path / "store")
    ivf.init_store(df.filter(F.col("vec_id") < 40), root)
    open(os.path.join(root, "_claim_shard_1"), "w").close()  # crashed writer
    got = ivf.append_shard(df.filter(F.col("vec_id") >= 40), root)
    assert got == 2
    assert ivf.store_shard_ids(spark, root) == [0, 2]


def test_claim_markers_invisible_to_readers(spark, tmp_path):
    """Underscore-prefixed claim markers must not break the parquet read
    or the shard-id listing."""
    df = _clustered(spark, n_clusters=4, per_cluster=20)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=200)
    root = str(tmp_path / "store")
    ivf.init_store(df.filter(F.col("vec_id") < 40), root)
    ivf.append_shard(df.filter(F.col("vec_id") >= 40), root)
    assert os.path.exists(os.path.join(root, "_claim_shard_1"))
    assert ivf.read_store(spark, root).count() == df.count()
    assert ivf.store_shard_ids(spark, root) == [0, 1]


# ---------------------------------------------------------------------------
# compact_store
# ---------------------------------------------------------------------------


def test_compact_store_dedups_refits_and_clears_audit(spark, tmp_path):
    df = _clustered(spark)  # 400 vectors
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    batch = df.filter(F.col("vec_id") >= 200)
    ivf.init_store(df.filter(F.col("vec_id") < 200), root)
    ivf.append_shard(batch, root)
    ivf.append_shard(batch, root)  # an at-least-once retry re-append
    before = ivf_store_audit(spark, root, n_lists=4, nprobe=2).collect()[0]
    assert before.n_vecs == 600  # duplicates inflate the store
    assert before.refit_recommended  # 4 lists vs sqrt(600)

    refit = ivf.compact_store(spark, root)
    assert refit is not ivf and refit.n_lists == 20  # isqrt(400)
    assert ivf.store_shard_ids(spark, root) == [0]
    store = ivf.read_store(spark, root)
    assert store.count() == 400  # retry duplicates reclaimed
    assert store.select("vec_id").distinct().count() == 400
    after = ivf_store_audit(
        spark, root, n_lists=refit.n_lists, nprobe=2
    ).collect()[0]
    assert after.n_vecs == 400 and after.n_shards == 1
    assert not after.refit_recommended  # the flag's remedy worked


def test_compact_store_search_equals_same_centroid_rebuild(spark, tmp_path):
    """Post-compact search over the store == the refit index's top-k over
    the in-memory corpus: compaction changes layout and quantizer, never
    results (the incremental_ann_check discipline applied to compact)."""
    df = _clustered(spark)
    ivf = IVFIndex(n_lists=4, nprobe=3, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    ivf.init_store(df.filter(F.col("vec_id") % 2 == 0), root)
    ivf.append_shard(df.filter(F.col("vec_id") % 2 == 1), root)
    refit = ivf.compact_store(spark, root)
    q = [1.0] + [0.0] * 15
    got = sorted(
        (r.vec_id, r.cos_sim)
        for r in refit.search_store(spark, root, q, k=10).collect()
    )
    want = sorted(
        (r.vec_id, r.cos_sim)
        for r in refit.query_topk(refit.assign(df), q, k=10).collect()
    )
    assert got == want


def test_compact_store_appends_continue_through_refit(spark, tmp_path):
    """The returned refit index owns the store after compact: a
    subsequent append lands as shard 1 against the NEW centroids and the
    union search still matches the refit's full-corpus top-k."""
    df = _clustered(spark)
    ivf = IVFIndex(n_lists=4, nprobe=3, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    first = df.filter(F.col("vec_id") < 300)
    late = df.filter(F.col("vec_id") >= 300)
    ivf.init_store(first, root)
    refit = ivf.compact_store(spark, root)
    assert refit.append_shard(late, root) == 1
    q = [1.0] + [0.0] * 15
    got = sorted(
        (r.vec_id, r.cos_sim)
        for r in refit.search_store(spark, root, q, k=10).collect()
    )
    want = sorted(
        (r.vec_id, r.cos_sim)
        for r in refit.query_topk(refit.assign(df), q, k=10).collect()
    )
    assert got == want


def test_read_paths_recover_stranded_precompact(spark, tmp_path):
    """A crash between compact's two renames leaves the only copy at
    <root>_precompact; every read path renames it back instead of
    surfacing a missing store."""
    df = _clustered(spark, n_clusters=4, per_cluster=20)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=200)
    root = str(tmp_path / "store")
    ivf.init_store(df, root)
    os.rename(root, root + "_precompact")  # the mid-swap crash
    assert ivf.read_store(spark, root).count() == df.count()
    assert os.path.isdir(root) and not os.path.exists(root + "_precompact")


# ---------------------------------------------------------------------------
# sq8 codec: byte codes at rest (VERDICT r12 #3)
# ---------------------------------------------------------------------------


def test_sq8_store_schema_and_search_equality(spark, tmp_path):
    """An sq8 store holds array<tinyint> codes and NO float column; a
    search over it equals the in-memory top-k over the same
    encode->decode round-trip (decode is bit-deterministic, so this is
    an exact frame equality, not a recall band)."""
    df = _clustered(spark)
    ivf = IVFIndex(n_lists=8, nprobe=3, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    ivf.init_store(
        df.filter(F.col("vec_id") % 2 == 0), root, codec="sq8"
    )
    ivf.append_shard(df.filter(F.col("vec_id") % 2 == 1), root)
    store = ivf.read_store(spark, root)
    assert "embedding" not in store.columns and "codes" in store.columns
    assert dict(store.dtypes)["codes"] == "array<tinyint>"
    assert store.count() == df.count()
    sq = IVFIndex._load_store_codec(spark, root)
    assert sq is not None and len(sq.lo) == 16
    q = [1.0] + [0.0] * 15
    got = sorted(
        (r.vec_id, r.cos_sim)
        for r in ivf.search_store(spark, root, q, k=10).collect()
    )
    mem = sq.encode(ivf.assign(df)).withColumn(
        "embedding", sq.decoded("codes")
    )
    want = sorted(
        (r.vec_id, r.cos_sim)
        for r in ivf.query_topk(mem, q, k=10).collect()
    )
    assert got == want


def test_sq8_store_bytes_smaller_than_raw(spark, tmp_path):
    """The point of the codec: vector bytes at rest shrink ~4x (parquet
    framing and metadata dilute the exact ratio — assert a conservative
    2x floor and report the measured ratio)."""
    df = _clustered(spark, n_clusters=8, per_cluster=100, dim=64)
    ivf = IVFIndex(n_lists=8, nprobe=3, seed=42).fit(df, sample_size=800)
    raw_root = str(tmp_path / "raw")
    sq_root = str(tmp_path / "sq8")
    ivf.init_store(df, raw_root)
    ivf.init_store(df, sq_root, codec="sq8")

    def du(root):
        total = 0
        for dirpath, _, files in os.walk(root):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
        return total

    raw_b, sq_b = du(raw_root), du(sq_root)
    ratio = raw_b / sq_b
    print(f"sq8 store bytes: raw={raw_b} sq8={sq_b} ratio={ratio:.2f}x")
    assert ratio >= 2.0, (raw_b, sq_b)


def test_sq8_append_encodes_against_frozen_sidecar(spark, tmp_path):
    """Appends encode with the sidecar's FROZEN bounds (values outside
    the fitted range clamp — the FAISS train/encode semantics), so codes
    stay comparable across shards and the sidecar never changes."""
    import json

    df = _clustered(spark, n_clusters=4, per_cluster=50)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=200)
    root = str(tmp_path / "store")
    ivf.init_store(df.filter(F.col("vec_id") < 100), root, codec="sq8")
    sidecar = os.path.join(root, "_quantizer.json")
    before = json.load(open(sidecar))
    ivf.append_shard(df.filter(F.col("vec_id") >= 100), root)
    assert json.load(open(sidecar)) == before
    assert ivf.read_store(spark, root).count() == df.count()
    got = ivf.search_store(spark, root, [1.0] + [0.0] * 15, k=5)
    assert got.count() == 5


def test_sq8_compact_carries_codes_and_sidecar(spark, tmp_path):
    """Compacting an sq8 store re-bins the EXISTING codes under the new
    centroids (no second quantization round-trip) and carries the frozen
    sidecar; post-compact search equals the refit index's top-k over the
    decoded corpus."""
    df = _clustered(spark)
    ivf = IVFIndex(n_lists=4, nprobe=3, seed=42).fit(df, sample_size=400)
    root = str(tmp_path / "store")
    batch = df.filter(F.col("vec_id") >= 200)
    ivf.init_store(df.filter(F.col("vec_id") < 200), root, codec="sq8")
    sq = IVFIndex._load_store_codec(spark, root)
    ivf.append_shard(batch, root)
    ivf.append_shard(batch, root)  # retry duplicate
    refit = ivf.compact_store(spark, root)
    assert ivf.store_shard_ids(spark, root) == [0]
    store = ivf.read_store(spark, root)
    assert store.count() == 400 and "codes" in store.columns
    assert os.path.exists(os.path.join(root, "_quantizer.json"))
    q = [1.0] + [0.0] * 15
    got = sorted(
        (r.vec_id, r.cos_sim)
        for r in refit.search_store(spark, root, q, k=10).collect()
    )
    dec = sq.encode(df).withColumn("embedding", sq.decoded("codes")).drop(
        "codes"
    )
    want = sorted(
        (r.vec_id, r.cos_sim)
        for r in refit.query_topk(refit.assign(dec), q, k=10).collect()
    )
    assert got == want


def test_sq8_store_audit_prices_byte_codes(spark, tmp_path):
    df = _clustered(spark, n_clusters=4, per_cluster=50)
    ivf = IVFIndex(n_lists=4, nprobe=2, seed=42).fit(df, sample_size=200)
    root = str(tmp_path / "store")
    ivf.init_store(df, root, codec="sq8")
    r = ivf_store_audit(spark, root, n_lists=4, nprobe=2).collect()[0]
    assert r.n_vecs == 200 and r.dim == 16
    assert r.probe_bytes_worst == r.probe_rows_worst * (1 * 16 + 8)


def test_claim_primitive_atomic_under_thread_hammer(spark, tmp_path):
    """Hammer the claim primitive directly: 8 threads x 20 claims each on
    one store must yield 160 DISTINCT ids (Hadoop LocalFileSystem's
    create(overwrite=false) is check-then-create and failed this under
    shard load; the local path now uses java.io.File.createNewFile,
    O_CREAT|O_EXCL)."""
    from concurrent.futures import ThreadPoolExecutor

    df = _clustered(spark, n_clusters=2, per_cluster=10)
    ivf = IVFIndex(n_lists=2, nprobe=1, seed=42).fit(df, sample_size=50)
    root = str(tmp_path / "store")
    ivf.init_store(df, root)

    def claim_many(_):
        return [ivf._claim_shard_id(spark, root) for _ in range(20)]

    with ThreadPoolExecutor(max_workers=8) as ex:
        ids = [i for chunk in ex.map(claim_many, range(8)) for i in chunk]
    assert len(ids) == 160 and len(set(ids)) == 160, sorted(ids)[:20]
