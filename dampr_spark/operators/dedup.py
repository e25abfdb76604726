"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all expressed as declarative DataFrame plans (no Python in
the row path — every hash/shingle/band is a JVM-side expression, so the whole
family survives a 100 TB corpus):

- :func:`exact_dedup` — hash-groupBy on a normalized fingerprint.
- :func:`minhash_lsh_candidates` / :func:`minhash_lsh_dedup` — shingle →
  minhash signature → banded LSH bucket join → exact-Jaccard verify.
- :func:`simhash` / :func:`simhash_dedup` — 64-bit SimHash with banded
  hamming candidate generation.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via a posting-list
  self-join (the non-approximate baseline the LSH variants approximate).
- :func:`embedding_cosine_dups` — near-duplicate pairs by embedding cosine.

Shuffle budget at scale (the design constraint): every strategy reduces to
(1) a narrow per-row signature projection, (2) ONE explode+groupBy shuffle
keyed on a small bucket key, (3) a verify step joined only within buckets.
Nothing ever shuffles full documents by document key; candidate pairs carry
ids, and text is re-joined only for the verify step on the (tiny) candidate
set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dampr_spark.functions.text import fingerprint

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5-fingerprint groupBy keeping the lowest id as
    canonical. One shuffle on a 32-byte key."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_" + id_col), F.count("*").alias("n_copies"))
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep only the canonical (min-id) row per fingerprint — the filtering
    companion to :func:`exact_dedup`."""
    canon = exact_dedup(df, text_col, id_col).select(
        F.col("canonical_" + id_col).alias(id_col)
    )
    return df.join(canon, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def char_shingles(col: str, k: int = 5) -> Column:
    """Distinct k-char shingles of a string as an array column — JVM-side:
    transform over an index sequence + substring."""
    c = F.col(col)
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(k))))


def shingle_hashes(shingles: Column) -> Column:
    """xxhash64 each shingle ONCE. Materialize this as a real column before
    computing signatures — the signature references it num_perm times, and an
    inlined expression would re-tokenize + re-hash per permutation (a
    measured 60× slowdown at sf0.1)."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


_MERSENNE_61 = (1 << 61) - 1


def _perm_coefs(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    # a odd ≤ 2^30, b ≤ 2^30: a·h32 + b < 2^62 never overflows a signed
    # long (ANSI mode throws on overflow), and mod 2^61−1 breaks the
    # monotonicity that a plain affine map would have.
    return [
        (rng.getrandbits(30) | 1, rng.getrandbits(30)) for _ in range(num_perm)
    ]


def minhash_signature(hashes: Column, num_perm: int = 64) -> Column:
    """MinHash signature from pre-hashed shingles: permutation j is the
    universal-hash family (a_j·h32 + b_j) mod 2^61−1 over the low 32 bits —
    pure long arithmetic per permutation instead of re-hashing strings
    (the standard datasketch construction)."""

    def perm(a: int, b: int):
        return lambda h: (h.bitwiseAND(F.lit((1 << 32) - 1)) * a + b) % _MERSENNE_61

    return F.array(
        *[
            F.array_min(F.transform(hashes, perm(a, b)))
            for a, b in _perm_coefs(num_perm)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Pipeline: signature (narrow) → explode into ``bands`` band-hashes →
    groupBy (band, band_hash) → intra-bucket id pairs (a < b) → distinct.
    The only shuffle is on the band-hash key; documents sharing any band
    collide. rows-per-bucket stays tiny for non-pathological corpora; a hot
    bucket (boilerplate spam) is the known failure mode — cap it with the
    ``max_bucket`` guard.
    """
    assert num_perm % bands == 0, "bands must divide num_perm"
    rows_per_band = num_perm // bands

    # Two projection steps on purpose: "hs" is referenced num_perm times by
    # the signature, so it must be a materialized column, not an inlined
    # expression (CollapseProject keeps multi-referenced non-cheap exprs).
    sig = (
        df.select(
            F.col(id_col).alias("id"),
            shingle_hashes(char_shingles(text_col, shingle_k)).alias("hs"),
        )
        .select("id", minhash_signature(F.col("hs"), num_perm).alias("sig"))
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    buckets = banded.groupBy("band", "band_hash").agg(
        F.collect_list("id").alias("ids")
    )
    # Hot-bucket guard: a bucket with B ids yields B^2/2 pairs; cap B.
    max_bucket = 1000
    pairs = (
        buckets.filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        .select(F.explode(_sorted_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )
    return pairs


def _sorted_pairs(ids: Column) -> Column:
    """All (a, b) pairs with a < b from an id array — JVM-side flatten of a
    nested transform."""
    s = F.array_sort(ids)
    return F.flatten(
        F.transform(
            s,
            lambda a, i: F.transform(
                F.slice(s, i + 2, F.greatest(F.size(s) - i - 1, F.lit(0))),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )


def jaccard(a_set: Column, b_set: Column) -> Column:
    inter = F.size(F.array_intersect(a_set, b_set))
    union = F.size(F.array_union(a_set, b_set))
    return inter / F.greatest(union, F.lit(1))


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified with exact shingle Jaccard.
    Only candidate ids re-join the shingle sets — the verify join is
    broadcast-sized relative to the corpus."""
    from pyspark import StorageLevel

    # Persist the (tiny) candidate-pair set: both the id-shrink and the
    # final verify join consume it, and without a persist Spark would replay
    # the whole signature+banding lineage for each consumer.
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_perm, bands, shingle_k
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Shrink to candidate ids BEFORE building shingle arrays: the semi-join
    # filters rows first, so the (expensive, wide) shingle projection runs
    # only for docs that appear in some candidate pair — typically a few
    # dozen rows, which then broadcast into the verify join.
    cand_ids = cands.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    sh = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        .join(cand_ids, "id", "left_semi")
        .select(F.col("id"), char_shingles("_txt", shingle_k).alias("sh"))
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_votes(col: str = "text", bits: int = 64) -> Column:
    """SimHash bit votes: per (distinct) token a 64-bit xxhash64; each bit
    position accumulates +1/−1 across tokens. One pass over the token array
    (single JVM aggregate producing an int array), no UDF."""
    toks = F.array_distinct(F.split(F.col(col), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # Literal bit masks; bit 63 is the sign bit of a signed long.
    masks = F.array(
        *[F.lit((1 << p) if p < 63 else -(1 << 63)) for p in range(bits)]
    )
    zeros = F.array_repeat(F.lit(0), bits)
    return F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks, lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)
            ),
            lambda a, b: a + b,
        ),
    )


def simhash_bands(votes: Column, bits: int = 64) -> Column:
    """Pack a vote vector into ``bits/16`` 16-bit band values — the banded
    fingerprint used for pigeonhole hamming search. Feed a *materialized*
    votes column (not the raw expression) so the aggregate runs once."""
    pow2 = F.array(*[F.lit(1 << i) for i in range(16)])
    return F.transform(
        F.sequence(F.lit(0), F.lit(bits // 16 - 1)),
        lambda b: F.aggregate(
            F.zip_with(
                F.slice(votes, b * 16 + 1, 16),
                pow2,
                lambda v, pw: F.when(v > 0, pw).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
    )


def simhash(col: str = "text", bits: int = 64) -> Column:
    """64-bit SimHash as an array of four 16-bit band ints. Convenience
    single-expression form; inside a plan prefer
    ``withColumn("votes", simhash_votes(...))`` + ``simhash_bands(col("votes"))``
    so the token aggregate isn't re-evaluated per band."""
    return simhash_bands(simhash_votes(col, bits), bits)


def hamming_distance(a: Column, b: Column, bits: int = 64) -> Column:
    """Hamming distance between two banded simhash arrays (16-bit bands):
    popcount of xor per band, summed. bit_count is a Spark built-in."""
    xors = F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)))
    return F.aggregate(xors, F.lit(0), lambda acc, x: acc + x)


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: documents sharing any 16-bit band are
    candidates (pigeonhole: hamming ≤ 3 over 4 bands ⇒ at least one band
    identical); verify with full hamming distance."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash_votes(text_col).alias("votes")
    ).select("id", simhash_bands(F.col("votes")).alias("sh"))
    banded = sh.select(
        "id", "sh", F.posexplode("sh").alias("band", "band_val")
    )
    buckets = banded.groupBy("band", "band_val").agg(
        F.collect_list(F.struct("id", "sh")).alias("docs")
    )
    pairs = (
        buckets.filter(F.size("docs") >= 2)
        .select(F.explode(_sorted_struct_pairs(F.col("docs"))).alias("p"))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            hamming_distance(F.col("p.a.sh"), F.col("p.b.sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def _sorted_struct_pairs(docs: Column) -> Column:
    s = F.array_sort(docs)
    return F.flatten(
        F.transform(
            s,
            lambda a, i: F.transform(
                F.slice(s, i + 2, F.greatest(F.size(s) - i - 1, F.lit(0))),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (the non-approximate baseline)
# ---------------------------------------------------------------------------


def word_ngrams(col: str, n: int = 3) -> Column:
    toks = F.split(F.col(col), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), cnt)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard via posting-list self-join: explode n-grams,
    pair ids sharing a gram, count shared grams per pair, then
    J = |∩| / (|A| + |B| − |∩|). No O(N²) compare — cost is bounded by
    posting-list sizes (a stopword-like hot gram is the skew risk; at scale
    drop the top-F most frequent grams first)."""
    grams = df.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    g_a = grams.select(F.col("id").alias("id_a"), "gram")
    g_b = grams.select(F.col("id").alias("id_b"), "gram")
    shared = (
        g_a.join(g_b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold (brute-force
    pairwise — exact baseline; use similarity.lsh_bucketed_pairs for the
    O(N·bucket) scale path)."""
    from dampr_spark.functions.vector import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
