"""CI pins for benchmarks/lsh_scale_proof_100x.py's fixture semantics.

The 100x proof's claims rest on three properties of the substitution-
cipher fixture; each is cheap to verify at test scale and would silently
invalidate the committed proof record if a refactor broke it:

1. **Copy independence** — cipher copies share no LSH candidates (a
   5-char shingle survives cross-copy only where the relative
   permutation fixes every letter), so organic growth adds buckets, not
   bucket depth.
2. **Verify soundness per copy** — exact shingle Jaccard is invariant
   under a 1:1 char map, so any pair a copy verifies is a true J>=0.8
   pair of the base corpus (no surplus is possible); CANDIDATE recall,
   though, is the LSH S-curve, not 1.0 — a threshold-grazing pair can
   miss every band under one copy's signature redraw (the 100x run
   measured a worst copy at 254 of 256) — so per-copy counts are pinned
   with tolerance, not equality.
3. **Remedy equivalence** — on the exact-replication adversarial
   fixture, `drop_exact_dups` keeps exactly the base corpus's min-id
   canonical rows (the base may carry exact-dup groups of its own), so
   LSH-after-exact-dedup at 100x reproduces dedup-then-LSH at 1x
   bit-for-bit.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

# benchmarks/ is not a package; derive the repo root from this file so the
# test works on any checkout location (r10 ADVICE).
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.lsh_scale_proof_100x import (  # noqa: E402
    COPY_STRIDE,
    cipher,
    organic_copies,
    replicate_exact,
)
from dampr_spark.operators.dedup import (  # noqa: E402
    drop_exact_dups,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
)
from dampr_spark.sources.readers import read_table

N_COPIES = 6


@pytest.fixture(scope="module")
def base(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def test_cipher_copy0_is_identity_and_all_distinct():
    perms = [cipher(i) for i in range(N_COPIES)]
    assert perms[0] == "abcdefghijklmnopqrstuvwxyz"
    assert len(set(perms)) == N_COPIES
    # every cipher is a permutation of the alphabet
    assert all(sorted(p) == sorted(perms[0]) for p in perms)


def test_organic_copies_share_no_candidates(spark, base):
    many = organic_copies(base, N_COPIES).localCheckpoint(eager=True)
    assert many.count() == base.count() * N_COPIES
    cands = minhash_lsh_candidates(many, bands=16)
    cross = cands.filter(
        F.floor(F.col("id_a") / COPY_STRIDE)
        != F.floor(F.col("id_b") / COPY_STRIDE)
    )
    assert cross.count() == 0


def test_verified_pairs_sound_per_copy(spark, base):
    many = organic_copies(base, N_COPIES).localCheckpoint(eager=True)
    one_pairs = set(
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(base).select("id_a", "id_b").collect()
    )
    # The brute-force truth the per-copy sets must stay inside: every
    # J>=0.8 pair of the base corpus (test scale keeps this affordable).
    from dampr_spark.operators.dedup import char_shingles, jaccard

    sh = base.select(
        F.col("doc_id").alias("id"), char_shingles("text").alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    true_pairs = set(
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.8)
        .select("id_a", "id_b")
        .collect()
    )
    assert one_pairs <= true_pairs

    many_pairs = minhash_lsh_dedup(many).select("id_a", "id_b").collect()
    by_copy: dict[int, set[tuple[int, int]]] = {}
    for r in many_pairs:
        ca, cb = r.id_a // COPY_STRIDE, r.id_b // COPY_STRIDE
        assert ca == cb  # invariant 1, on the verified set
        by_copy.setdefault(ca, set()).add(
            (r.id_a - ca * COPY_STRIDE, r.id_b - ca * COPY_STRIDE)
        )
    assert set(by_copy) == set(range(N_COPIES))
    for c in range(N_COPIES):
        # soundness: no copy can verify a pair that is not truly J>=0.8
        assert by_copy[c] <= true_pairs, f"copy {c} surplus pairs"
        # recall tolerance: the S-curve can drop threshold-grazers only
        assert len(by_copy[c]) >= 0.85 * len(one_pairs), f"copy {c} recall"


def test_adversarial_remedy_restores_1x(spark, base):
    anchor = drop_exact_dups(base).localCheckpoint(eager=True)
    adv = replicate_exact(base, N_COPIES).localCheckpoint(eager=True)
    survivors = drop_exact_dups(adv).localCheckpoint(eager=True)
    # min-id canonical == the base corpus's own canonical rows (the base
    # may carry exact-dup groups; both paths collapse them identically)
    assert survivors.count() == anchor.count()
    assert survivors.filter(F.col("doc_id") >= COPY_STRIDE).count() == 0
    anchor_pairs = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(anchor).select("id_a", "id_b").collect()
    )
    remedy_pairs = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(survivors).select("id_a", "id_b").collect()
    )
    assert remedy_pairs == anchor_pairs
