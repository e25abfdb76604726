"""Head-to-head TF-IDF throughput: this engine vs the reference library.

Reproduces the reference's own macro-benchmark (benchmarks/tf-idf-dampr.py:
text → flat_map(per-line distinct words) → count with map-side combine →
broadcast cross with corpus line count → TSV sink) three ways over the SAME
generated corpus:

1. the reference Dampr library itself (PYTHONPATH=/root/reference,
   multiprocessing over all cores);
2. our fluent API (same pipeline verbatim, RDD-backed on Spark);
3. our DataFrame catalog shape (declarative plan, whole-stage codegen).

The corpus is the TESTDATA documents table's text replicated N times —
pass a multiplier as argv[1] (default 20, ~30 MB).

Outputs one JSON line with wall seconds per engine and the doc-freq row
count each produced (they must agree).

Usage: python benchmarks/vs_reference.py [multiplier]
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import sys
import tempfile
import time

RX = re.compile(r"[^\w]+")


def build_corpus(mult: int, sf_dir: str, out: str) -> int:
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    with open(out, "w") as f:
        for _ in range(mult):
            for (t,) in rows:
                f.write(t + "\n")
    return len(rows) * mult


_REF_SCRIPT = r"""
import json, math, multiprocessing, os, re, sys, time
corpus, outdir = sys.argv[1], sys.argv[2]
RX = re.compile(r"[^\w]+")
from dampr import Dampr  # the reference library itself
chunk_size = os.stat(corpus).st_size / multiprocessing.cpu_count()
t0 = time.perf_counter()
docs = Dampr.text(corpus, int(chunk_size) + 1)
doc_freq = docs.flat_map(lambda x: set(RX.split(x.lower()))).count(
    reduce_buffer=float("inf")
)
idf = doc_freq.cross_right(
    docs.len(),
    lambda df, total: (df[0], df[1], math.log(1 + (float(total) / df[1]))),
    memory=True,
)
idf.sink_tsv(outdir).run()
print(json.dumps({"sec": time.perf_counter() - t0}))
"""


def run_reference(corpus: str, outdir: str) -> tuple[float, int]:
    """Run the reference library in a CLEAN subprocess: its multiprocessing
    fork deadlocks when forked from a py4j/JVM-attached parent."""
    import subprocess

    env = dict(os.environ, PYTHONPATH="/root/reference")
    out = subprocess.run(
        [sys.executable, "-c", _REF_SCRIPT, corpus, outdir],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    dt = json.loads(out.stdout.strip().splitlines()[-1])["sec"]
    n = sum(
        sum(1 for _ in open(os.path.join(outdir, p)))
        for p in os.listdir(outdir)
        if p.startswith("part")
    )
    return dt, n


def run_fluent(corpus: str, outdir: str) -> tuple[float, int]:
    import multiprocessing

    from dampr_spark.api import Dampr

    # Same chunking rule as the reference benchmark: one chunk per core.
    # chunk_size selects the Python-native byte-range reader, so corpus
    # bytes go disk -> Python worker without a JVM pickle hop.
    chunk = int(os.stat(corpus).st_size / multiprocessing.cpu_count()) + 1
    t0 = time.perf_counter()
    docs = Dampr.text(corpus, chunk_size=chunk)
    doc_freq = docs.flat_map(lambda x: set(RX.split(x.lower()))).count()
    idf = doc_freq.cross_right(
        docs.len(),
        lambda df, total: (df[0], df[1], math.log(1 + (float(total) / df[1]))),
        memory=True,
    )
    idf.sink_tsv(outdir).run()
    dt = time.perf_counter() - t0
    n = sum(
        sum(1 for _ in open(os.path.join(outdir, p)))
        for p in os.listdir(outdir)
        if p.startswith("part") and not p.endswith(".crc")
    )
    return dt, n


def run_dataframe(spark, corpus: str, outdir: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    # Split the single text file across every core: the 128 MB default
    # leaves a multi-GB corpus at ~size/128MB tasks (21 for 2.68 GB on 32
    # cores — a third of the machine idle). Same per-core chunking rule the
    # reference and fluent paths already use.
    import multiprocessing

    per_core = os.stat(corpus).st_size // multiprocessing.cpu_count() + 1
    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(max(4 * 1024 * 1024, per_core)),
    )
    try:
        t0 = time.perf_counter()
        lines = spark.read.text(corpus)
        # Sentinel token per line folds the corpus line count into the SAME
        # single-pass aggregate as the per-word doc frequencies — one corpus
        # scan total (the broadcast-subquery form re-scanned the corpus for
        # the count; at sub-GB scale that second scan was the gap to the
        # reference's zero-startup design). "\x00" can't tokenize out of
        # \w+ splits, so it never collides with a real word.
        sent = "\x00lines\x00"
        tokens = lines.select(
            F.explode(
                F.concat(
                    F.array(F.lit(sent)),
                    F.array_distinct(
                        F.split(F.lower(F.col("value")), r"[^\w]+")
                    ),
                )
            ).alias("word")
        )
        # vocab-sized result (tiny): pin it so the scalar read and the sink
        # both reuse the one scan+combine job
        agg = (
            tokens.groupBy("word")
            .agg(F.count("*").alias("df"))
            .localCheckpoint(eager=True)
        )
        total = agg.filter(F.col("word") == sent).first()["df"]
        idf = agg.filter(F.col("word") != sent).select(
            "word", "df", F.log(1 + F.lit(float(total)) / F.col("df")).alias("idf")
        )
        idf.write.mode("overwrite").csv(outdir, sep="\t")
        dt = time.perf_counter() - t0
    finally:
        # restore: the per-corpus split size must not leak into later runs
        # sharing this session (other corpora, the fluent path)
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)
    n = sum(
        sum(1 for _ in open(os.path.join(outdir, p)))
        for p in os.listdir(outdir)
        if p.startswith("part") and not p.endswith(".crc")
    )
    return dt, n


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    work = tempfile.mkdtemp(prefix="tfidf_bench_")
    corpus = os.path.join(work, "corpus.txt")
    n_lines = build_corpus(mult, sf_dir, corpus)
    os.sync()  # flush corpus writeback so it doesn't contend with timed IO
    size_mb = os.path.getsize(corpus) / 1e6

    # Spark first so its (slow, one-off) session startup isn't in any timing.
    from dampr_spark.session import get_spark

    spark = get_spark(app_name="tfidf-vs-reference")
    spark.read.text(corpus).count()  # warm page cache for Spark paths
    # Spawn the Python worker pool before ANY timed run (the bench.py
    # discipline): the first Python-lambda job otherwise pays ~2-3 s of
    # one-time per-core worker forks — session infrastructure like the JVM
    # startup, which is already excluded from every engine's timing. The
    # reference's equivalent (multiprocessing fork at run start) is
    # near-free because its children inherit the parent's imports, so
    # excluding the Spark pool spawn is the apples-to-apples choice.
    import multiprocessing as _mp

    par = spark.sparkContext.defaultParallelism
    spark.sparkContext.parallelize(range(par), par).map(
        lambda i: (__import__("time").sleep(0.3), i)[1]
    ).count()

    df_t, df_n = run_dataframe(spark, corpus, os.path.join(work, "out_df"))
    fl_t, fl_n = run_fluent(corpus, os.path.join(work, "out_fluent"))
    ref_t, ref_n = run_reference(corpus, os.path.join(work, "out_ref"))

    print(
        json.dumps(
            {
                "metric": "tfidf_throughput_vs_reference",
                "corpus_mb": round(size_mb, 1),
                "corpus_lines": n_lines,
                "reference_dampr_sec": round(ref_t, 2),
                "fluent_api_sec": round(fl_t, 2),
                "dataframe_sec": round(df_t, 2),
                "rows": {"reference": ref_n, "fluent": fl_n, "dataframe": df_n},
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
