#!/usr/bin/env python
"""Arrow-transfer evidence for the round-14 multimodal projection fix
(round 15, VERDICT r14 next-round #8).

Round 14 narrowed every multimodal ``mapInPandas`` input to exactly the
columns its Python body reads (guide §4.1: Spark cannot see inside an
opaque Python function, so an unprojected input ships — and scans —
every column through Arrow). The fix landed with code + oracle evidence
but no measurement. This micro-bench supplies it, on the same
documents-as-media corpus the ``multimodal_features`` bench query uses:

- ``projected``   — extract_features' shape: select("media_id",
  "kind", "content") before mapInPandas.
- ``unprojected`` — the pre-r14 shape: the full 7-column media frame
  (mime/width/height/duration_ms ride along) into the same body.

Reported per arm: interleaved warm wall-clock (median of reps) and the
measured Arrow input width per row — the Python body records
``sum(memory_usage(deep)) / rows`` of the pandas batches it receives,
aggregated via a Spark accumulator, so the transfer reduction is a
measured number rather than a schema argument.

Usage: PYTHONPATH=/root/repo python benchmarks/multimodal_arrow_bench.py [reps]
"""
import os
import sys
import time
import statistics
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dampr_spark.operators import multimodal  # noqa: E402
from dampr_spark.operators.multimodal import FEATURES_SCHEMA, _fake_decode  # noqa: E402
from dampr_spark.session import get_spark  # noqa: E402
from dampr_spark.sources.readers import read_table  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="multimodal-arrow-bench")
    spark.sparkContext.setLogLevel("ERROR")
    media = multimodal.documents_as_media(
        read_table(spark, sf_dir, "documents")
    )

    bytes_acc = spark.sparkContext.accumulator(0)
    rows_acc = spark.sparkContext.accumulator(0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bytes_acc.add(int(pdf.memory_usage(deep=True).sum()))
            rows_acc.add(len(pdf))
            feats = [
                _fake_decode(c if c is not None else b"").tolist()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(c) if c is not None else 0
                        for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    def arm(projected: bool) -> float:
        src = (
            media.select("media_id", "kind", "content")
            if projected
            else media
        )
        t0 = time.perf_counter()
        src.mapInPandas(run, schema=FEATURES_SCHEMA).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, list[float]] = {"projected": [], "unprojected": []}
    widths: dict[str, float] = {}
    for name, proj in (("projected", True), ("unprojected", False)):
        arm(proj)  # warm + measure width once
        bytes_acc.value = 0
        rows_acc.value = 0
        arm(proj)
        widths[name] = bytes_acc.value / max(rows_acc.value, 1)
    for r in range(reps):
        order = (
            ("projected", True), ("unprojected", False)
        ) if r % 2 == 0 else (("unprojected", False), ("projected", True))
        for name, proj in order:
            results[name].append(arm(proj))
    for name in ("projected", "unprojected"):
        med = statistics.median(results[name])
        print(
            f"{name:12s} warm med {med:.3f}s over {reps} reps, "
            f"pandas batch width {widths[name]:.0f} B/row"
        )
    red = 1 - widths["projected"] / max(widths["unprojected"], 1e-9)
    print(f"arrow input reduction: {100 * red:.1f}% bytes/row")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
