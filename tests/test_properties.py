"""Property-based tests: the fluent API vs a pure-Python model of the
reference semantics (dampr/dampr.py DSL), over hypothesis-generated inputs.

The reference's own suite is example-based (SURVEY §5); these properties
pin the same contracts — keyed grouping, associative folds, co-group joins,
ordering of grouped reads — against randomized data, including the empty
and duplicate-heavy cases the examples miss.

Each example runs a real (local) Spark job, so example counts are kept
small and the deadline is disabled.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dampr_spark.api import Dampr

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

ints = st.lists(st.integers(min_value=-50, max_value=50), max_size=30)


@pytest.fixture(scope="module", autouse=True)
def _session(spark):
    Dampr.use_session(spark)


@given(xs=ints)
@settings(**SETTINGS)
def test_map_filter_flatmap_pipeline(xs):
    got = (
        Dampr.memory(xs)
        .map(lambda x: x * 3)
        .filter(lambda x: x % 2 == 0)
        .flat_map(lambda x: [x, -x])
        .run()
        .read()
    )
    want = [s for x in xs for y in [x * 3] if y % 2 == 0 for s in (y, -y)]
    assert sorted(got) == sorted(want)


@given(xs=ints)
@settings(**SETTINGS)
def test_fold_by_matches_dict_accumulation(xs):
    got = Dampr.memory(xs).fold_by(
        lambda x: x % 5, value=lambda x: x, binop=lambda a, b: a + b
    ).run().read()
    acc: dict[int, int] = defaultdict(int)
    for x in xs:
        acc[x % 5] += x
    # grouped stages read back in key order (reference dampr/runner.py:352-374)
    assert got == sorted(acc.items())


@given(xs=ints)
@settings(**SETTINGS)
def test_group_by_reduce_matches_manual_groups(xs):
    got = (
        Dampr.memory(xs)
        .group_by(lambda x: abs(x) % 3)
        .reduce(lambda k, vs: sorted(vs))
        .run()
        .read()
    )
    groups: dict[int, list] = defaultdict(list)
    for x in xs:
        groups[abs(x) % 3].append(x)
    assert got == sorted((k, sorted(v)) for k, v in groups.items())


@given(xs=ints, ys=ints)
@settings(**SETTINGS)
def test_inner_join_cogroup(xs, ys):
    left = Dampr.memory(xs).group_by(lambda x: x % 4)
    right = Dampr.memory(ys).group_by(lambda y: y % 4)
    got = left.join(right).reduce(lambda l, r: (sorted(l), sorted(r))).run().read()
    lg, rg = defaultdict(list), defaultdict(list)
    for x in xs:
        lg[x % 4].append(x)
    for y in ys:
        rg[y % 4].append(y)
    want = sorted(
        (k, (sorted(lg[k]), sorted(rg[k]))) for k in lg.keys() & rg.keys()
    )
    assert got == want


@given(xs=ints, k=st.integers(min_value=1, max_value=8))
@settings(**SETTINGS)
def test_topk_matches_nlargest(xs, k):
    got = Dampr.memory(xs).topk(k).run().read()
    assert sorted(got, reverse=True) == heapq.nlargest(k, xs)


@given(xs=ints)
@settings(**SETTINGS)
def test_sort_by_is_globally_sorted(xs):
    got = Dampr.memory(xs).sort_by(lambda x: -x).run().read()
    assert got == sorted(xs, reverse=True)


@given(xs=ints)
@settings(**SETTINGS)
def test_len_and_sample_edges(xs):
    assert Dampr.memory(xs).len().run().read() == [len(xs)]
    assert Dampr.memory(xs).sample(0.0).run().read() == []


texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40), min_size=0, max_size=12
)


@given(docs=texts, n=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_ngram_jaccard_matches_python_model(spark_session_holder, docs, n):
    """Exact n-gram Jaccard is deterministic — the Spark plan must agree
    with a direct Python computation pair-for-pair on random corpora."""
    spark = spark_session_holder
    from dampr_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, n=n, threshold=0.0).collect()
    }

    def grams(t):
        toks = t.split(" ")
        cnt = max(len(toks) - (n - 1), 1)
        return {" ".join(toks[i : i + n]) for i in range(cnt)}

    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                ga, gb = grams(a), grams(b)
                inter = len(ga & gb)
                if inter:
                    want[(i, j)] = round(inter / (len(ga) + len(gb) - inter), 6)
    assert got == pytest.approx(want)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.lists(
        st.text(alphabet="abcdefg xyz", min_size=1, max_size=8), min_size=1, max_size=12
    ),
    n_emails=st.integers(0, 3),
    n_phones=st.integers(0, 3),
    n_ips=st.integers(0, 2),
)
def test_pii_redaction_complete(spark_session_holder, words, n_emails, n_phones, n_ips):
    """After redaction, NO PII pattern may remain, every planted item is
    counted, and a text with no PII passes through byte-identical."""
    spark = spark_session_holder
    from pyspark.sql import functions as F

    from dampr_spark.functions.text import pii_counts, redact_pii

    clean = " ".join(w.strip() or "pad" for w in words)
    planted = (
        clean
        + " " + " ".join(f"user{i}@example{i}.com" for i in range(n_emails))
        + " " + " ".join(f"+1-555-010{i}" for i in range(n_phones))
        + " " + " ".join(f"192.168.{i}.7" for i in range(n_ips))
    )
    df = spark.createDataFrame([(clean,), (planted,)], "text string")
    e, p, i = pii_counts("text")
    out = df.select(
        "text",
        e.alias("e"), p.alias("p"), i.alias("i"),
        redact_pii("text").alias("red"),
    )
    rows = {r.text: r for r in out.collect()}
    red_counts = (
        spark.createDataFrame([(rows[planted].red,)], "text string")
        .select(pii_counts("text")[0].alias("e"), pii_counts("text")[1].alias("p"),
                pii_counts("text")[2].alias("i"))
        .first()
    )
    assert (red_counts.e, red_counts.p, red_counts.i) == (0, 0, 0)
    assert rows[planted].e == n_emails
    assert rows[planted].p == n_phones
    assert rows[planted].i == n_ips
    assert rows[clean].red == clean  # no-PII text untouched


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # key
            st.integers(min_value=0, max_value=500),      # ts
        ),
        max_size=40,
    ),
    rng=st.integers(min_value=1, max_value=120),          # frame width == bucket width
)
@settings(**SETTINGS)
def test_bucketed_range_window_equals_plain(spark_session_holder, rows, rng):
    """bucketed_range_window must equal the plain per-key RANGE window for
    ANY key/ts multiset and any frame width — including duplicate
    timestamps, bucket-boundary values, and sparse keys."""
    spark = spark_session_holder
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dampr_spark.operators import skew

    if not rows:
        return
    df = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(rows)],
        "k int, t long, v double",
    )
    w = Window.partitionBy("k").orderBy("t").rangeBetween(-rng, 0)
    plain = df.select(
        "k", "t", "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.round(F.sum("v").over(w), 6).alias("s"),
    )
    bucketed = skew.bucketed_range_window(
        df, keys=["k"], ts_us_col="t", range_us=rng,
        cols_fn=lambda win: {
            "n": F.count(F.lit(1)).over(win),
            "s": F.round(F.sum("v").over(win), 6),
        },
    ).select("k", "t", "v", "n", "s")
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        max_size=60,
    ),
    probs=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
)
@settings(**SETTINGS)
def test_exact_quantiles_matches_builtin_percentile(spark_session_holder, xs, probs):
    """Distributed rank-join quantiles must equal Spark's single-reducer
    exact percentile for any multiset (ties, negatives, singletons) and any
    probability vector."""
    spark = spark_session_holder
    from pyspark.sql import functions as F

    from dampr_spark.operators.stats import exact_quantiles

    if not xs:
        return
    df = spark.createDataFrame([(float(v),) for v in xs], "x double")
    got = exact_quantiles(df, "x", probs).first()
    exp = df.agg(
        *[F.percentile("x", F.lit(p)).alias(f"e{i}") for i, p in enumerate(probs)]
    ).first()
    assert got["n"] == len(xs)
    for i in range(len(probs)):
        assert got[f"q_{i}"] == pytest.approx(exp[f"e{i}"], rel=1e-12, abs=1e-9)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=50,
    ),
)
@settings(**SETTINGS)
def test_exact_group_quantiles_matches_builtin(spark_session_holder, rows):
    """Per-group distributed quantiles must equal the built-in per-group
    percentile aggregate for any grouped multiset."""
    spark = spark_session_holder
    from pyspark.sql import functions as F

    from dampr_spark.operators.stats import exact_group_quantiles

    probs = [0.5, 0.9]
    df = spark.createDataFrame([(g, float(v)) for g, v in rows], "g string, x double")
    got = {r["g"]: r for r in exact_group_quantiles(df, ["g"], "x", probs).collect()}
    exp = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.percentile("x", F.lit(p)).alias(f"e{i}") for i, p in enumerate(probs)],
        )
        .collect()
    }
    assert set(got) == set(exp)
    for gk in exp:
        assert got[gk]["n"] == exp[gk]["n"]
        for i in range(len(probs)):
            assert got[gk][f"q_{i}"] == pytest.approx(
                exp[gk][f"e{i}"], rel=1e-12, abs=1e-9
            )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    items=st.lists(
        st.sampled_from([f"i{j}" for j in range(12)])
        | st.text(alphabet="pqr", min_size=1, max_size=3),
        max_size=120,
    ),
    k=st.integers(1, 6),
    capacity=st.integers(8, 64),
)
def test_heavy_hitters_always_exact(spark_session_holder, items, k, capacity):
    """Whatever the skew/capacity, the two-pass sketch must return the EXACT
    top-k with (count desc, item asc) tie-break — certified path and
    fallback path alike."""
    from collections import Counter

    from dampr_spark.operators.sketches import heavy_hitters

    spark = spark_session_holder
    if capacity <= k:
        capacity = k + 1
    df = spark.createDataFrame(
        [(v,) for v in items] or [(None,)], "item string"
    ).repartition(4)
    got = [(r.item, r.cnt) for r in heavy_hitters(df, "item", k=k, capacity=capacity).collect()]
    want = sorted(Counter(items).items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    series=st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_ewma_fold_matches_pandas(spark_session_holder, series):
    """The declarative array-fold EWMA equals pandas' ewm(alpha=.5,
    adjust=False) — an independent implementation of the same recurrence."""
    import pandas as pd

    from pyspark.sql import functions as F

    spark = spark_session_holder
    rows = [
        (u, i, float(v))
        for u, vals in enumerate(series)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    per = df.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("seq", "value"))).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda s: s.value)
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    got = {r.user_id: r.e for r in per.select("user_id", ewma.alias("e")).collect()}
    for u, valseq in enumerate(series):
        want = pd.Series(valseq).ewm(alpha=0.5, adjust=False).mean().iloc[-1]
        assert abs(got[u] - want) < 1e-9, (u, got[u], want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=9),
        min_size=1,
        max_size=10,
    ),
    chunk_tokens=st.integers(2, 4),
    min_docs=st.integers(2, 3),
)
def test_boilerplate_removal_matches_python_model(
    spark_session_holder, docs, chunk_tokens, min_docs
):
    import hashlib

    from dampr_spark.operators.dedup import remove_boilerplate_chunks

    spark = spark_session_holder
    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_removed, r.n_tokens_after, r.clean_fp)
        for r in remove_boilerplate_chunks(
            df, chunk_tokens=chunk_tokens, min_docs=min_docs
        ).collect()
    }
    # python model
    def chunks_of(toks):
        return [
            " ".join(toks[i : i + chunk_tokens])
            for i in range(0, len(toks), chunk_tokens)
        ]

    from collections import defaultdict

    chunk_docs = defaultdict(set)
    for i, toks in enumerate(docs):
        for c in chunks_of(toks):
            chunk_docs[c].add(i)
    hot = {c for c, ds in chunk_docs.items() if len(ds) >= min_docs}
    for i, toks in enumerate(docs):
        cs = chunks_of(toks)
        kept = [c for c in cs if c not in hot]
        want = (
            len(cs),
            len(cs) - len(kept),
            sum(len(c.split(" ")) for c in kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
        assert got[i] == want, (i, got[i], want)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "yy", "zzz", "w"]), min_size=1, max_size=8),
        min_size=2,
        max_size=10,
    ),
    max_distance=st.integers(0, 8),
)
def test_fuzzy_pairs_match_python_model(spark_session_holder, docs, max_distance):
    from dampr_spark.operators.dedup import fuzzy_prefix_pairs

    spark = spark_session_holder
    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.lev
        for r in fuzzy_prefix_pairs(
            df, block_tokens=2, prefix_chars=10, max_distance=max_distance,
            max_block=100,
        ).collect()
    }
    want = {}
    blocks = [" ".join(t.split(" ")[:2]) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if blocks[i] == blocks[j]:
                d = _lev(texts[i][:10], texts[j][:10])
                if d <= max_distance:
                    want[(i, j)] = d
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    spans=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 60)),  # (start_sec, dur)
        min_size=1,
        max_size=25,
    )
)
def test_interval_coalescing_matches_python_model(spark_session_holder, spans):
    """The cumulative-max chain merge equals a sorted sweep-line union."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = spark_session_holder
    base = datetime.datetime(2025, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=s), base + datetime.timedelta(seconds=s + d))
        for i, (s, d) in enumerate(spans)
    ]
    df = spark.createDataFrame(rows, "i long, s timestamp, e timestamp")
    w_prev = Window.orderBy("s", "e").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("s", "e").rowsBetween(Window.unboundedPreceding, 0)
    marked = df.withColumn(
        "new_grp",
        F.when(
            F.max("e").over(w_prev).isNull() | (F.col("s") > F.max("e").over(w_prev)),
            1,
        ).otherwise(0),
    ).withColumn("g", F.sum("new_grp").over(w_run))
    got = sorted(
        (r.ms, r.me)
        for r in marked.groupBy("g")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .collect()
    )
    # python sweep-line union
    ivs = sorted((s, s + d) for s, d in spans)
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    want = sorted(
        (base + datetime.timedelta(seconds=s), base + datetime.timedelta(seconds=e))
        for s, e in merged
    )
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["p", "q", "r", "s", "t"]), min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    ),
    max_df=st.integers(1, 6),
)
def test_token_cooccurrence_caps_match_python_model(spark_session_holder, docs, max_df):
    """Pair supports under the document-frequency cap equal the python
    model: tokens over the DF cap never pair; supports count distinct-doc
    co-occurrence."""
    from collections import Counter
    from itertools import combinations

    from pyspark.sql import functions as F

    spark = spark_session_holder
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    dt = df.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).distinct()
    ok = dt.groupBy("tok").count().filter(F.col("count") <= max_df).select("tok")
    dtk = dt.join(ok, "tok")
    a = dtk.select("doc_id", F.col("tok").alias("tok_a"))
    b = dtk.select("doc_id", F.col("tok").alias("tok_b"))
    got = {
        (r.tok_a, r.tok_b): r.support
        for r in a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .collect()
    }
    docsets = [sorted(set(toks)) for toks in docs]
    dfreq = Counter(t for s in docsets for t in s)
    keep = {t for t, c in dfreq.items() if c <= max_df}
    want = Counter()
    for s in docsets:
        for x, y in combinations([t for t in s if t in keep], 2):
            want[(x, y)] += 1
    assert got == dict(want)


# ---------------------------------------------------------------------------
# round-7: suffix-run substring dedup vs a pure-Python model
# ---------------------------------------------------------------------------


def _brute_spans(docs: dict[int, list[str]], w: int, min_len: int):
    """All maximal cross-doc repeated runs >= min_len tokens, by direct
    alignment scan: for each doc pair and offset, extend equal-token runs."""
    out = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ta, tb = docs[a], docs[b]
            for off in range(-(len(tb) - 1), len(ta)):
                run = 0
                for pa in range(max(0, off), len(ta)):
                    pb = pa - off
                    if pb >= len(tb):
                        break
                    if ta[pa] == tb[pb]:
                        run += 1
                    else:
                        if run >= min_len:
                            out.add((a, pa - run + 1, b, pa - run - off + 1, run))
                        run = 0
                if run >= min_len:
                    pa = min(len(ta), len(tb) + off)
                    out.add((a, pa - run + 1, b, pa - run - off + 1, run))
    return out


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14
        ),
        min_size=0,
        max_size=4,
    ),
    min_len=st.integers(min_value=2, max_value=4),
)
@settings(**SETTINGS)
def test_repeated_substring_spans_match_alignment_model(spark, docs, min_len):
    """The suffix-run plan (anchor postings -> diagonal islands) must find
    EXACTLY the maximal alignment runs a direct O(n^2 L) scan finds, for
    any corpus, with anchor_tokens == min_len and no cap. Tiny alphabet
    forces dense repeats, overlaps, and periodic structure."""
    from dampr_spark.operators.dedup import repeated_substring_spans

    model = {i + 1: toks for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in model.items()], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.start_a, r.id_b, r.start_b, r.match_len)
        for r in repeated_substring_spans(
            df, anchor_tokens=min_len, min_len=min_len, max_posting=10**6
        ).collect()
    }
    # empty-token edge: a doc of [] serializes to "" which tokenizes to
    # [""] — mirror that in the model so both sides see the same corpus
    model2 = {i: (t if t else [""]) for i, t in model.items()}
    want = _brute_spans(model2, min_len, min_len)
    assert got == want


@given(
    ivals=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=30),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_interval_union_matches_set_model(spark, ivals):
    """_interval_union_tokens == |set union| for arbitrary overlapping,
    duplicated, nested intervals (the gaps-and-islands + distinct
    machinery under every coverage/trim operator)."""
    from dampr_spark.operators.dedup import _interval_union_tokens

    rows = [(1, s, s + l) for s, l in ivals]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    got = _interval_union_tokens(df).first().dup_tokens
    want = len({p for s, l in ivals for p in range(s, s + l + 1)})
    assert got == want
