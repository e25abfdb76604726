"""Smoke tests for the examples/ ports of the reference's example programs
(reference examples/wc.py, examples/word-stats.py, benchmarks/tf-idf-dampr.py)
— each runs end-to-end on a tiny corpus with hand-checked expected output."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from dampr_spark.api import Dampr


@pytest.fixture()
def corpus(tmp_path):
    f = tmp_path / "corpus.txt"
    f.write_text("the cat sat\nthe dog sat\nthe cat ran\n")
    return str(f)


def test_wc_example(corpus, spark):
    Dampr.use_session(spark)
    wc = (
        Dampr.text(corpus)
        .flat_map(lambda x: x.split())
        .fold_by(lambda x: x, value=lambda _x: 1, binop=lambda x, y: x + y)
        .sort_by(lambda wc_pair: -wc_pair[1])
    )
    res = wc.run().read()
    assert res[0] == ("the", 3)
    assert dict(res) == {"the": 3, "cat": 2, "sat": 2, "dog": 1, "ran": 1}


def test_word_stats_example(corpus, spark):
    Dampr.use_session(spark)
    import word_stats

    total_count, top_words, word_lengths, avg = word_stats.build(corpus)
    tc, tw, wl, awl = Dampr.run(total_count, top_words, word_lengths, avg)
    assert tc.read(1)[0][1] == 9  # 9 words total
    assert tw.read(1)[0] == ("the", 3)
    assert dict(wl.read()) == {3: 9}  # every word is 3 chars
    assert awl.read(1)[0][1] == pytest.approx(3.0)


def test_tfidf_example(corpus, tmp_path, spark):
    Dampr.use_session(spark)
    import tfidf

    out = tmp_path / "idfs"
    tfidf.main(corpus, str(out))
    rows = {}
    for part in out.glob("part-*"):
        if part.suffix == ".crc":
            continue
        for line in part.read_text().splitlines():
            word, df, idf_v = line.split("\t")
            rows[word] = (int(df), float(idf_v))
    # 'the' appears in all 3 lines; 'dog' in 1
    assert rows["the"] == (3, pytest.approx(math.log(1 + 3 / 3)))
    assert rows["dog"] == (1, pytest.approx(math.log(1 + 3 / 1)))


def test_corpus_prep_example(spark):
    """The corpus-prep pipeline on a hand-built corpus: the low-quality doc
    and the exact/near duplicates fall out; the survivors and the token
    accounting are exact."""
    import corpus_prep

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "to find some food because it is hungry after a long day of work "
    )
    rows = [
        (1, base * 3),
        (2, base * 3),                      # exact dup of 1
        (3, base * 3 + "slightly changed tail here"),  # near dup of 1
        (4, "x y z"),                        # fails min_tokens / quality
        (5, ("an entirely different document about spark shuffles joins and "
             "aggregation strategies that is long enough to pass the gates "
             "and repeats nothing from the other documents in this corpus ") * 2),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clean, report = corpus_prep.build(docs, near_dup_threshold=0.5)
    kept = sorted(r.doc_id for r in clean.select("doc_id").collect())
    assert kept == [1, 5]
    rep = report.collect()[0]
    assert rep.n_docs == 2 and rep.total_tokens > 0


def test_semantic_dedup_example(spark, sf_dir):
    """SemDeDup composition on a planted corpus (the TESTDATA embeddings
    carry no organic near-dups): every original unioned with an exact clone
    at vec_id+10000. Each clone must land in its original's near-dup group
    (identical vectors share every LSH bucket and every k-means cluster),
    members must share a k-means cluster, and the cluster-restricted pair
    set must be a subset of the unrestricted one."""
    from semantic_dedup import semantic_dedup

    from dampr_spark.operators.similarity import (
        RandomHyperplaneLSH,
        kmeans_fit_assign,
    )
    from dampr_spark.sources.readers import read_table

    base = read_table(spark, sf_dir, "embeddings").limit(200)
    clones = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    e = base.union(clones)
    clusters = semantic_dedup(e, k=4, tau=0.99)
    pair_of = {r.id: r.canonical for r in clusters.collect()}
    originals = {r.vec_id for r in base.collect()}
    # Every original forms a group with exactly its clone.
    assert len(pair_of) == 2 * len(originals)
    for vid in originals:
        assert pair_of[vid] == vid and pair_of[vid + 10000] == vid

    assigned = {r.id: r.cluster for r in kmeans_fit_assign(e, k=4, iters=3).collect()}
    for member, canon in pair_of.items():
        assert assigned[member] == assigned[canon]

    lsh = RandomHyperplaneLSH(dim=64, n_planes=6, n_tables=8)
    unrestricted = {
        (r.id_a, r.id_b) for r in lsh.bucketed_pairs(e, threshold=0.99).collect()
    }
    a2 = e.join(
        kmeans_fit_assign(e, k=4, iters=3).select(
            F.col("id").alias("vec_id"), "cluster"
        ),
        "vec_id",
    )
    restricted = {
        (r.id_a, r.id_b)
        for r in lsh.bucketed_pairs(a2, threshold=0.99, extra_keys=("cluster",)).collect()
    }
    assert restricted <= unrestricted and restricted


def test_semantic_dedup_whitened_variant(spark, sf_dir):
    """The PCA-whitened path must produce a valid clustering (canonical is
    a member id, groups are disjoint) and find the same order of magnitude
    of dup structure as the raw path at a loose tau."""
    import semantic_dedup

    from dampr_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings")
    raw = semantic_dedup.semantic_dedup(e, k=4, tau=0.4)
    white = semantic_dedup.semantic_dedup(e, k=4, tau=0.4, whiten_dims=16)
    for res in (raw, white):
        rows = res.collect()
        ids = {r.id for r in rows}
        assert all(r.canonical in ids for r in rows)
        assert all(r.canonical <= r.id for r in rows)
    assert white.count() > 0


def test_corpus_prep_decontaminate_and_shards(spark):
    """Round-6 pipeline stages: fuzzy decontamination drops the planted
    paraphrase of a benchmark doc; shard assignment is deterministic,
    covers every doc exactly once, and the manifest accounts for all of
    them."""
    import corpus_prep

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "a completely different document about spark shuffle partitions"),
            (3, "the quick brown fox jumps over the lazy dog near the river"),
        ],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.size(F.split("text", " ")))
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    kept = corpus_prep.decontaminate(docs, bench, tau=0.5)
    assert sorted(r.doc_id for r in kept.collect()) == [2]

    sharded, manifest = corpus_prep.shard_manifest(docs, n_shards=4)
    rows = sharded.collect()
    assert all(0 <= r.shard_id < 4 for r in rows) and len(rows) == 3
    m = manifest.agg(F.sum("n_docs"), F.sum("n_tokens")).first()
    assert m[0] == 3 and m[1] == sum(r.n_tokens for r in rows)
    # deterministic across runs
    again = {r.doc_id: r.shard_id for r in corpus_prep.shard_manifest(docs, 4)[0].collect()}
    assert again == {r.doc_id: r.shard_id for r in rows}


def test_exactsubstr_dedup_example(spark):
    """Full ExactSubstr pipeline on a planted corpus: a doc that is >80%
    someone else's content is dropped whole, partial sharers get the span
    trimmed keep-first, clean docs pass through verbatim — and the output
    corpus has NO remaining cross-doc repeated run >= min_len."""
    from exactsubstr_dedup import exactsubstr_dedup

    from dampr_spark.operators.dedup import repeated_substring_spans

    def w(p, n):
        return " ".join(f"{p}{i}" for i in range(n))

    shared = w("run", 30)
    rows = [
        (1, w("a", 10) + " " + shared),          # keeps the run (lowest id)
        (2, w("c", 20) + " " + shared),           # trimmed: 60% dup < 0.8
        (3, shared + " " + w("t", 2)),            # dropped: 30/32 = 94% dup
        (4, w("z", 40)),                          # untouched
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in exactsubstr_dedup(docs, min_len=20, drop_frac=0.8).collect()}

    assert sorted(out) == [1, 2, 4]               # doc 3 dropped whole
    assert out[1].action == "kept" and shared in out[1].text
    assert out[2].action == "trimmed" and out[2].text == w("c", 20)
    assert out[4].action == "kept" and out[4].text == w("z", 40)
    # fixpoint: the cleaned corpus has no remaining >=20-token cross-doc run
    cleaned = spark.createDataFrame(
        [(i, out[i].text) for i in sorted(out)], "doc_id long, text string"
    )
    assert repeated_substring_spans(cleaned, min_len=20).count() == 0


def test_corpus_prep_round7_stages(spark):
    """The round-7 pipeline stages compose on a planted corpus: substring
    trim removes the shared passage from the later doc, the fluency gate
    drops the token-salad doc, and DSIR weights rank the target-like doc
    above the off-domain one."""
    from corpus_prep import dsir_reweight, fluency_gate, trim_substrings

    def w(p, n):
        return " ".join(f"{p}{i}" for i in range(n))

    common = "the cat sat on the mat and then " * 5
    shared = w("run", 25)
    rows = [
        (1, (common + shared).strip()),
        (2, (common + "x y " + shared).strip()),     # shares the 25-token run
        (3, common.strip()),
        (4, " ".join(f"zq{i} xv{i}" for i in range(20))),  # token salad
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )

    trimmed = {r.doc_id: r for r in trim_substrings(docs, min_len=20).collect()}
    assert shared in trimmed[1].text          # doc 1 keeps the run
    assert shared not in trimmed[2].text      # doc 2 loses it
    assert trimmed[2].n_tokens < trimmed[1].n_tokens
    assert sorted(trimmed) == [1, 2, 3, 4]

    fluent = fluency_gate(docs, max_ppl=20.0)
    kept = {r.doc_id for r in fluent.select("doc_id").collect()}
    assert 4 not in kept and {1, 2, 3} <= kept

    # target = the common-phrase domain (docs 1-3; a 39-token single-doc
    # target would be smoothing-dominated at 256 buckets)
    target = docs.filter(F.col("doc_id") <= 3)
    weighted = {r.doc_id: r.log_weight for r in dsir_reweight(docs, target).collect()}
    assert min(weighted[1], weighted[2], weighted[3]) > weighted[4]


def test_dup_graph_analysis_example(spark, sf_dir):
    """Triage invariants on the real fixture: every component has >= 2
    members (it came from a pair graph), community count never exceeds
    member count, and 2-member components always collapse (no split
    verdict is possible below 3 nodes)."""
    from dup_graph_analysis import dup_graph_triage

    from dampr_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    rows = dup_graph_triage(docs).collect()
    assert rows
    for r in rows:
        assert r.n_members >= 2
        assert 1 <= r.n_communities <= r.n_members
        if r.n_members == 2:
            assert r.verdict == "collapse"
        if r.n_communities > 1:
            assert r.verdict == "split"
    # The planted near-dup clusters in the fixture produce at least one
    # dense collapse-verdict component.
    assert any(r.verdict == "collapse" for r in rows)


def test_sketch_olap_example(spark):
    """All four sketch answers come out coherent on a known tiny frame:
    HLL near the true distinct count, CMS >= true frequency (upper
    bound), Bloom passes all true members (no false negatives), and the
    histogram p50 lands within a bin of the true median."""
    from sketch_olap import sketch_report

    rows = [
        (i, f"u{i % 40}", "purchase" if i % 3 == 0 else "view", float(i % 100))
        for i in range(600)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, value double"
    )
    rep = sketch_report(events)
    assert abs(rep["est_distinct_users"] - 40) < 10  # ~4.6% HLL sigma
    true_view = sum(1 for r in rows if r[2] == "view")
    assert rep["est_top_type_freq"] >= true_view  # CMS upper bound
    # every one of the 40 users purchased at least once (i%3==0 hits all
    # residues of i%40 over 600 rows), so Bloom must pass all 40
    assert rep["bloom_passed_user_ids"] == 40
    assert abs(rep["p50_value"] - 50.0) < 2.0


def test_growing_corpus_example(spark, sf_dir, tmp_path):
    """Growing-corpus loop: near-dup screen at the door, incremental
    scored-index appends, scheduled compaction, resolution re-audit,
    from_dataset re-entry — with search-spans-old-and-new pinned against
    a from-scratch rebuild over the same survivor set."""
    from growing_corpus import (
        grow,
        reenter_prior_run,
        resolution_checkpoint,
    )
    from dampr_spark.api import Dampr
    from dampr_spark.operators.indexer import Indexer
    from dampr_spark.sources.readers import read_table

    Dampr.use_session(spark)
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    seed = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    shard1 = docs.filter(F.col("doc_id") % 4 == 1).select("doc_id", "text")
    # shard2 contains exact copies of seed docs (new ids): the screen
    # must drop them all.
    dupes = seed.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    shard2 = (
        docs.filter(F.col("doc_id") % 4 == 2)
        .select("doc_id", "text")
        .unionByName(dupes)
    )

    root = str(tmp_path / "grow_idx")
    rep = grow(spark, root, seed, [shard1, shard2], compact_every=3)
    assert rep["dropped"][1] >= 20  # every planted dup caught at the door
    assert rep["compactions"] >= 1 and rep["n_shards_final"] < 3

    # Search spans old+new identically to a from-scratch rebuild over the
    # same surviving history (shard-union == rebuild, the round-8 pin).
    terms = ["the", "data"]
    got = {
        (r.doc_id, r.bm25)
        for r in rep["index"].search_bm25(spark, terms, k=12).collect()
    }
    rebuilt = Indexer(str(tmp_path / "rebuild_idx")).build_scored(
        rep["history"].select("doc_id", "text")
    )
    want = {
        (r.doc_id, r.bm25)
        for r in rebuilt.search_bm25(spark, terms, k=12).collect()
    }
    assert got == want and got

    emb = read_table(spark, sf_dir, "embeddings")
    assert resolution_checkpoint(emb) in (2, 4, 6, None)

    assert reenter_prior_run([3, 1, 2]) == [11, 21, 31]

    # The vector-side loop (round 12): shard appends against frozen
    # centroids, per-append re-pricing, store search == in-memory search
    # over the same corpus+centroids.
    from growing_corpus import grow_vector_store
    from dampr_spark.functions.vector import valid_vector

    vecs = emb.filter(valid_vector("embedding")).select("vec_id", "embedding")
    vseed = vecs.filter(F.col("vec_id") % 3 == 0)
    vb1 = vecs.filter(F.col("vec_id") % 3 == 1)
    vb2 = vecs.filter(F.col("vec_id") % 3 == 2)
    vroot = str(tmp_path / "grow_ivf")
    vrep = grow_vector_store(spark, vroot, vseed, [vb1, vb2])
    assert vrep["n_shards"] == 3
    assert vrep["appended"][-1] == vecs.count()  # conservation per audit
    ivf = vrep["ivf"]
    q = [float(x) for x in vecs.orderBy("vec_id").first().embedding]
    got = sorted(
        (r.vec_id, r.cos_sim)
        for r in ivf.search_store(spark, vroot, q, k=5).collect()
    )
    want = sorted(
        (r.vec_id, r.cos_sim)
        for r in ivf.query_topk(ivf.assign(vecs), q, k=5).collect()
    )
    assert got == want
