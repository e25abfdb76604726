"""Substring/suffix-run 100x budget proof (round 10): ties the family's
new sizing instrument (`substring_posting_audit`, landed this round) to
a two-decade measurement the same round — the pattern every other
audit-bearing family follows.

Fixture: the LSH proof's per-copy substitution cipher (imported). For
the SUBSTRING family the cipher gives something stronger than it gave
LSH: anchor windows are 8-TOKEN sequences and a cipher maps token
sequences bijectively, so every copy's per-window occurrence counts are
IDENTICAL to copy-0's (no signature redraw, no S-curve) while two
copies share a window only if the relative permutation fixes all ~40+
letters (never). The organic-100x invariants are therefore EXACT:

- audit: anchor_positions and raw/capped pair budgets exactly 100x the
  1x values; zero cross-copy anchors (checked via the budget identity).
- spans: `repeated_substring_spans` returns exactly 100x the 1x spans,
  every copy's destrided span set EQUAL to copy-0's, zero cross-copy.

Adversarial (verbatim 100x replication, the exact-dup-saturated crawl):
every window's occurrence count multiplies by 100, so at the default
cap (64 < 100) the audit prices TOTAL recall loss — anchors_over_cap ==
every repeated anchor, capped_pairs == 0 — in one linear pass; the
remedy is the LSH proof's: `drop_exact_dups` first, then spans on the
survivors reproduce dedup-then-spans at 1x bit-for-bit.

Prints one JSON line; prose goes to benchmarks/RESULTS.md.

Usage: PYTHONPATH=/root/repo python benchmarks/substring_scale_proof_100x.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from benchmarks.lsh_scale_proof_100x import (  # noqa: E402
    COPY_STRIDE,
    organic_copies,
    replicate_exact,
)
from dampr_spark.operators.dedup import (  # noqa: E402
    drop_exact_dups,
    repeated_substring_spans,
    substring_posting_audit,
)
from dampr_spark.session import get_spark  # noqa: E402
from dampr_spark.sources.readers import read_table  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_COPIES = 100
ANCHOR, MIN_LEN, CAP = 8, 20, 64


def audit_row(df) -> dict:
    t0 = time.perf_counter()
    r = substring_posting_audit(
        df, anchor_tokens=ANCHOR, max_posting=CAP
    ).first()
    d = dict(r.asDict())
    d["audit_sec"] = round(time.perf_counter() - t0, 3)
    return d


def spans_set(df):
    return set(
        (r.id_a, r.start_a, r.id_b, r.start_b, r.match_len)
        for r in repeated_substring_spans(
            df, anchor_tokens=ANCHOR, min_len=MIN_LEN, max_posting=CAP
        ).collect()
    )


def main() -> int:
    spark = get_spark(app_name="substring-scale-proof-100x")
    docs = (
        read_table(spark, BASE, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    one = organic_copies(docs, 1).localCheckpoint(eager=True)
    hundred = organic_copies(docs, N_COPIES).localCheckpoint(eager=True)
    out = {
        "metric": "substring_scale_proof_100x",
        "docs_1x": one.count(),
        "docs_100x": hundred.count(),
    }

    out["audit_1x"] = audit_row(one)
    out["audit_100x"] = audit_row(hundred)
    a1, a100 = out["audit_1x"], out["audit_100x"]
    # EXACT 100x identities: bijective windows, zero cross-copy anchors.
    out["budget_exact_100x"] = all(
        a100[k] == 100 * a1[k]
        for k in (
            "anchor_positions",
            "anchors_ge2",
            "raw_pairs",
            "capped_pairs",
            "pairs_dropped",
        )
    ) and a100["max_posting_sz"] == a1["max_posting_sz"]

    t0 = time.perf_counter()
    s1 = spans_set(one)
    out["spans_1x"] = len(s1)
    out["spans_1x_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    s100 = spans_set(hundred)
    out["spans_100x"] = len(s100)
    out["spans_100x_sec"] = round(time.perf_counter() - t0, 3)
    per_copy: dict[int, set] = {}
    cross = 0
    for a, sa, b, sb, ln in s100:
        ca, cb = a // COPY_STRIDE, b // COPY_STRIDE
        if ca != cb:
            cross += 1
        else:
            per_copy.setdefault(ca, set()).add(
                (a - ca * COPY_STRIDE, sa, b - ca * COPY_STRIDE, sb, ln)
            )
    out["cross_copy_spans"] = cross
    out["spans_exact_100x"] = (
        cross == 0
        and len(per_copy) == N_COPIES
        and all(per_copy[c] == s1 for c in range(N_COPIES))
    )

    # Adversarial: priced, not paid (capped budget is ZERO — the cap
    # zeroes recall outright at 100 replicas > 64; the audit says so in
    # one pass), then the exact-dedup-first remedy at 1x economics.
    adv = replicate_exact(one, N_COPIES).localCheckpoint(eager=True)
    out["audit_adv"] = audit_row(adv)
    out["adv_recall_zeroed"] = (
        out["audit_adv"]["capped_pairs"] == 0
        and out["audit_adv"]["anchors_over_cap"] >= a1["anchors_ge2"]
    )
    anchor_corpus = drop_exact_dups(one).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    survivors = drop_exact_dups(adv).localCheckpoint(eager=True)
    out["remedy_exact_dedup_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    remedy = spans_set(survivors)
    out["remedy_spans_sec"] = round(time.perf_counter() - t0, 3)
    out["remedy_spans_equal_1x"] = remedy == spans_set(anchor_corpus)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
