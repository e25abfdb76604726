"""Z-order layout: curve math vs a Python reference, file-level clustering
of the z-ordered write, and partition pruning of 2-D box queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from dampr_spark.operators.layout import z_bucket, z_value, zorder_by


def _z_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_reference(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", z_value(F.col("x"), F.col("y"), bits=3).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _z_ref(x, y, 3)
    # Curve positions over a full square are a permutation of 0..63.
    assert sorted(got.values()) == list(range(64))


def test_z_value_masks_high_bits(spark):
    df = spark.createDataFrame([(1 << 40, 3)], "x long, y long")
    z = df.select(z_value(F.col("x"), F.col("y"), bits=4).alias("z")).first().z
    assert z == _z_ref((1 << 40) & 0xF, 3, 4)


def test_zorder_by_writes_disjoint_curve_segments(spark, sf_dir, tmp_path_factory):
    """Range partitioning on z must give each output file a contiguous,
    non-overlapping z-range — the property that makes every file's min/max
    envelope tight in BOTH dimensions."""
    from dampr_spark.sources.readers import read_table

    out = str(tmp_path_factory.mktemp("zorder_out") / "orders_z")
    o = read_table(spark, sf_dir, "orders")
    zorder_by(o, "o_custkey", "o_orderkey", n_partitions=8).write.parquet(out)

    back = spark.read.parquet(out).select(
        F.input_file_name().alias("f"), "z"
    )
    ranges = sorted(
        (r.zmin, r.zmax)
        for r in back.groupBy("f").agg(F.min("z").alias("zmin"), F.max("z").alias("zmax")).collect()
    )
    assert len(ranges) > 1
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"overlapping curve segments: {ranges}"


def test_z_bucket_partition_pruning(spark, sf_dir, tmp_path_factory):
    """Directory-partitioning on the coarse curve segment makes a 2-D box
    query prune: the filtered read must touch a strict subset of files and
    the plan must carry a PartitionFilters entry."""
    from dampr_spark.sources.readers import read_table

    out = str(tmp_path_factory.mktemp("zbucket_out") / "orders_zb")
    o = read_table(spark, sf_dir, "orders").withColumn(
        "zb", z_bucket(F.col("o_custkey"), F.floor("o_totalprice"), bits=16, bucket_bits=4)
    )
    o.write.partitionBy("zb").parquet(out)

    import os

    # The coarse curve segments are real directories, and the box filter
    # selects a strict subset of them (custkey < 2^14 zeroes z-bits 28/30,
    # so segments {0,2} of {0,2,8,10} satisfy zb <= 3).
    dirs = [d for d in os.listdir(out) if d.startswith("zb=")]
    hit = [d for d in dirs if int(d.split("=")[1]) <= 3]
    assert 0 < len(hit) < len(dirs)

    # Plan-lock: the filter lands in PartitionFilters (directory pruning),
    # not as a post-scan data filter.
    pruned_df = spark.read.parquet(out).filter(F.col("zb") <= 3)
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "zb" in pf and "<= 3" in pf


def test_compact_parquet_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path_factory):
    from dampr_spark.operators.layout import compact_parquet
    from dampr_spark.sources.readers import read_table

    out = str(tmp_path_factory.mktemp("compact") / "events_many")
    ev = read_table(spark, sf_dir, "events")
    n = ev.count()
    ev.repartition(40).write.parquet(out)  # simulate many small landed files
    import glob

    assert len(glob.glob(out + "/*.parquet")) >= 40
    n_files = compact_parquet(spark, out, target_mb=128)
    assert n_files == 1  # tiny table -> single file
    back = spark.read.parquet(out)
    assert back.count() == n


def test_compact_parquet_resorts_on_column(spark, sf_dir, tmp_path_factory):
    """sort_col re-establishes clustering: each compacted file holds a
    contiguous non-overlapping range of the sort column."""
    from dampr_spark.operators.layout import compact_parquet
    from dampr_spark.sources.readers import read_table

    out = str(tmp_path_factory.mktemp("compact2") / "orders_many")
    read_table(spark, sf_dir, "orders").repartition(20).write.parquet(out)
    compact_parquet(spark, out, target_mb=1)
    import glob

    from pyspark.sql import functions as F

    n_before = len(glob.glob(out + "/*.parquet"))
    compact_parquet(spark, out, target_mb=1, sort_col="o_orderkey")
    back = spark.read.parquet(out).select(F.input_file_name().alias("f"), "o_orderkey")
    ranges = sorted(
        (r.lo, r.hi)
        for r in back.groupBy("f")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    assert n_before >= 1


def test_compact_parquet_clears_stale_crash_leftovers(spark, sf_dir, tmp_path_factory):
    """A previously crashed compaction leaves `.compact`/`.old` dirs; the
    next run must clear them up front (a stale `.old` would otherwise make
    shutil.move NEST the live table inside it) and still produce a correct
    result."""
    import os

    from dampr_spark.operators.layout import compact_parquet
    from dampr_spark.sources.readers import read_table

    out = str(tmp_path_factory.mktemp("compact3") / "nation_t")
    nation = read_table(spark, sf_dir, "nation")
    n = nation.count()
    nation.repartition(6).write.parquet(out)
    # simulate crash leftovers
    os.makedirs(out + ".old/garbage", exist_ok=True)
    os.makedirs(out + ".compact", exist_ok=True)
    with open(out + ".old/garbage/x.parquet", "w") as f:
        f.write("junk")
    n_files = compact_parquet(spark, out, target_mb=128)
    assert n_files == 1
    assert not os.path.exists(out + ".old") and not os.path.exists(out + ".compact")
    assert spark.read.parquet(out).count() == n


def test_compact_parquet_recovers_mid_swap_crash(spark, sf_dir, tmp_path_factory):
    """A crash BETWEEN the two swap renames leaves the live table only at
    `.old` (and the fresh rewrite at `.compact`). A re-run must restore
    `.old` back to `path` before any cleanup — deleting it as 'stale'
    would permanently lose the table (ADVICE r5, medium)."""
    import os
    import shutil

    from dampr_spark.operators.layout import compact_parquet
    from dampr_spark.sources.readers import read_table

    out = str(tmp_path_factory.mktemp("compact4") / "nation_t")
    nation = read_table(spark, sf_dir, "nation")
    n = nation.count()
    nation.repartition(6).write.parquet(out)
    # Simulate the exact mid-swap crash window: path moved to .old, the new
    # copy still at .compact, nothing at path.
    shutil.move(out, out + ".old")
    spark.read.parquet(out + ".old").coalesce(1).write.parquet(out + ".compact")
    assert not os.path.exists(out)
    n_files = compact_parquet(spark, out, target_mb=128)
    assert n_files == 1
    assert not os.path.exists(out + ".old") and not os.path.exists(out + ".compact")
    assert spark.read.parquet(out).count() == n
