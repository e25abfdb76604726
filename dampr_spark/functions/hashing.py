"""Cross-engine hash-replay SQL generators.

md5 is the one hash both engines compute identically over UTF-8 text
(Spark's hash()/xxhash64 are engine-seeded), which is what lets
hash-derived operators — deterministic weighted sampling, the fake
multimodal decoder — carry full DuckDB oracles. DuckDB's md5 returns a hex
VARCHAR, so these helpers parse digest bytes out of the hex string
nibble-by-nibble (strpos into the hex alphabet); Spark-side equivalents use
``F.conv``/byte arithmetic directly.
"""

from __future__ import annotations


def md5_uint_sql(inner: str, n_bytes: int = 4, little_endian: bool = True) -> str:
    """DuckDB SQL for the unsigned integer of the first ``n_bytes`` of
    ``md5(inner)``, in the requested byte order. ``inner`` is a SQL VARCHAR
    expression (md5 hashes its UTF-8 bytes — identical to Spark's F.md5
    over the same text)."""
    h = f"md5({inner})"

    def nib(k: int) -> str:
        return f"(strpos('0123456789abcdef', substr({h}, {k}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    weights = (
        [256**j for j in range(n_bytes)]
        if little_endian
        else [256 ** (n_bytes - 1 - j) for j in range(n_bytes)]
    )
    terms = [
        byte(j) if w == 1 else f"{byte(j)} * {w}" for j, w in enumerate(weights)
    ]
    return "(" + " + ".join(terms) + ")"


def md5_bucket(expr, n_buckets: int):
    """Spark Column twin of ``md5_uint_sql(..., 4, little_endian=False) %
    n_buckets``: first 4 md5 bytes (big-endian) of the expression's string
    value, mod ``n_buckets``. THE cross-engine bucket hash — every
    hashed-feature operator (DSIR buckets, CMS cells) must route through
    this single definition (and its SQL twin above) or the "bit-identical
    in Spark and DuckDB" oracle guarantee silently diverges."""
    return md5_uint(expr) % n_buckets


def md5_uint(expr):
    """Spark Column twin of ``md5_uint_sql(..., 4, little_endian=False)``:
    the unsigned 32-bit integer of the first 4 md5 bytes (big-endian) as a
    long — the raw uniform bits behind ``md5_bucket``, exposed for
    operators that need more than a modulus (HLL register layout)."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("long")
