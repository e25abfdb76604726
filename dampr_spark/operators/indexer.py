"""Persistent inverted index over a document corpus — the Spark-native
equivalent of the reference's SQLite ``Indexer`` (dampr/utils/indexer.py:
``build`` walks a corpus writing a per-file key→byte-offset table:35-70;
``union(keys)`` retrieves lines matching ANY key via SQL IN:72-92;
``intersect(keys, min_match)`` lines matching ≥ min_match keys via GROUP
BY/HAVING:94-125).

Spark-first redesign: the index is a **parquet posting-list table**
``(token, doc_id)`` written bucketed-and-sorted by token. Lookups are
plans, not seeks:

- ``union`` → ``token IN (keys)`` filter on the posting table (predicate
  pushdown prunes row groups; bucketing prunes files) → distinct doc ids.
- ``intersect`` → same filter, then ``groupBy(doc_id).count() >= min_match``
  — exactly the reference's GROUP BY/HAVING, as a Catalyst plan.

The returned id sets join back to the corpus (left-semi) for the rows
themselves — ids, not documents, flow through the index path, so the
query cost scales with posting-list sizes, never corpus size. For
predicate-only one-shot searches with no index on disk, see the
``keyword_search_*`` catalog queries (arrays_overlap / array_intersect
scans).

**Incremental shards (round 8)**: the index root holds one or more
``shard_NNNNN`` parquet directories; ``build*`` clears the root and writes
shard 0, ``append*`` adds a new shard for a batch of NEW documents without
touching existing ones (the persisted-state discipline of the streaming
near-dup store: immutable history, additive updates), and queries read the
shard glob — the ``token IN`` pushdown and bucketing behave identically
because every shard is token-hashed and token-sorted on its own.
``compact()`` folds all shards into one (a full token re-shuffle) when
small appended shards accumulate enough to hurt lookup fan-out. Filesystem
operations go through the Hadoop FileSystem API, so the layout works on
HDFS/S3, not just local disk. Appended doc_ids must be NEW — re-indexing
a changed document requires compaction after excluding it upstream
(tombstones are out of scope, as in the reference's insert-only SQLite
table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def default_tokenizer(col: Column) -> Column:
    """Whitespace tokens, deduped — the reference indexes each line's
    distinct keys (dampr/utils/indexer.py:60-63 inserts per-key rows)."""
    return F.array_distinct(F.split(col, r"\s+"))


class Indexer:
    """Build / query a parquet inverted index.

    >>> ix = Indexer("/data/idx").build(docs, "text", "doc_id")
    >>> hits = ix.union(spark, ["spark", "shuffle"])          # any key
    >>> strict = ix.intersect(spark, ["spark", "shuffle"], 2) # >= 2 keys
    >>> rows = ix.retrieve(docs, hits, "doc_id")
    """

    def __init__(self, path: str, n_buckets: int = 16):
        self.path = path
        self.n_buckets = n_buckets

    # -- shard plumbing (Hadoop FS API: works on HDFS/S3, not just local) --

    def _fs(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(root)
        return path.getFileSystem(spark._jsc.hadoopConfiguration()), path, jvm

    def _recover_precompact(self, spark: SparkSession, root: str) -> bool:
        """Self-heal :meth:`compact`'s documented crash window: the swap is
        two renames, and a crash between them leaves the only copy stranded
        at ``root_precompact`` with ``root`` absent. Every read path calls
        this first, so a reader (or the next compact) after such a crash
        renames the stranded copy back into place instead of seeing an
        empty index — recovery was previously manual (round-10 ADVICE)."""
        fs, path, jvm = self._fs(spark, root)
        if fs.exists(path):
            return False
        old = jvm.org.apache.hadoop.fs.Path(root + "_precompact")
        return fs.exists(old) and bool(fs.rename(old, path))

    def _shard_ids(self, spark: SparkSession, root: str) -> list[int]:
        fs, path, _ = self._fs(spark, root)
        if not fs.exists(path) and not self._recover_precompact(spark, root):
            return []
        return sorted(
            int(st.getPath().getName()[6:])
            for st in fs.listStatus(path)
            if st.getPath().getName().startswith("shard_")
        )

    def _clear(self, spark: SparkSession, root: str) -> None:
        fs, path, _ = self._fs(spark, root)
        if fs.exists(path):
            fs.delete(path, True)

    def _guard_shard_type(
        self, spark: SparkSession, expected_cols: list[str]
    ) -> None:
        """Fail fast when an append would mix shard schemas (boolean
        ``(token, doc_id)`` vs scored ``(token, doc_id, tf)`` vs positional
        ``(token, doc_id, pos)``) under one root — a mixed root would
        otherwise fail or silently mis-merge at the ``shard_*`` union read."""
        ids = self._shard_ids(spark, self.path)
        if not ids:
            return
        have = spark.read.parquet(
            f"{self.path}/shard_{ids[0]:05d}"
        ).columns
        if list(have) != list(expected_cols):
            raise ValueError(
                f"Indexer at {self.path!r} holds {have} shards; appending "
                f"{expected_cols} shards would mix index types. Rebuild or "
                "use a different path."
            )

    def _write_shard(self, postings: DataFrame, root: str, shard: int) -> None:
        (
            postings.repartition(self.n_buckets, "token")
            .sortWithinPartitions("token")
            .write.mode("overwrite")
            .parquet(f"{root}/shard_{shard:05d}")
        )

    @staticmethod
    def _boolean_postings(
        df: DataFrame, text_col: str, id_col: str, tokenizer
    ) -> DataFrame:
        return df.select(
            F.explode(tokenizer(F.col(text_col))).alias("token"),
            F.col(id_col).alias("doc_id"),
        ).filter(F.col("token") != "")

    def build(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        tokenizer=default_tokenizer,
    ) -> "Indexer":
        """Tokenize → explode → (token, doc_id) postings, written sorted by
        token within token-hashed files so point lookups touch few row
        groups. One shuffle (the repartition by token). Clears any existing
        shards and writes shard 0 (the ``_stats`` sidecar a previous
        ``build_scored`` may have left is cleared too — a boolean index must
        not answer BM25 queries from stale statistics)."""
        self._clear(df.sparkSession, self.path)
        self._clear(df.sparkSession, self.path + "_stats")
        self._write_shard(
            self._boolean_postings(df, text_col, id_col, tokenizer), self.path, 0
        )
        return self

    def append(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        tokenizer=default_tokenizer,
    ) -> "Indexer":
        """Index a batch of NEW documents as an additional shard — the
        growing-corpus path: existing shards are immutable, the new batch
        pays only its own tokenize+shuffle (never a rebuild over history).
        Lookups see the union immediately; run :meth:`compact` when many
        small shards accumulate."""
        spark = df.sparkSession
        self._guard_shard_type(spark, ["token", "doc_id"])
        ids = self._shard_ids(spark, self.path)
        nxt = (ids[-1] + 1) if ids else 0
        self._write_shard(
            self._boolean_postings(df, text_col, id_col, tokenizer), self.path, nxt
        )
        return self

    def compact(self, spark: SparkSession) -> "Indexer":
        """Fold every shard into a single token-hashed shard 0 (one full
        re-shuffle of the postings — the same cost as a fresh build over
        the union, so schedule it like any other maintenance compaction).
        The consolidated shard is written beside the live ones, the live
        root is renamed ASIDE (never deleted first), the new root renamed
        in, and only then is the old root deleted — so a crash at any step
        leaves a readable index either at ``root`` or at ``root_precompact``
        (auto-recovered by :meth:`_recover_precompact` on every read path).
        Note the swap is still two renames, not one atomic op, and on
        object stores (S3A) each rename is copy+delete — the window where
        ``root`` is briefly absent exists but never destroys data, and a
        reader landing inside it self-heals on its next call."""
        for root in (self.path, self.path + "_stats"):
            ids = self._shard_ids(spark, root)
            if len(ids) <= 1:
                continue
            fs, _, jvm = self._fs(spark, root)
            hpath = jvm.org.apache.hadoop.fs.Path
            tmp = f"{root}_compacting"
            old = f"{root}_precompact"
            self._clear(spark, tmp)
            self._clear(spark, old)
            all_rows = spark.read.parquet(f"{root}/shard_*")
            if root == self.path:
                self._write_shard(all_rows, tmp, 0)
            else:  # stats sidecar: doc-keyed, no token bucketing
                all_rows.write.mode("overwrite").parquet(f"{tmp}/shard_00000")
            if not fs.rename(hpath(root), hpath(old)):
                raise IOError(f"compact: failed to move {root} aside")
            if not fs.rename(hpath(tmp), hpath(root)):
                # Roll back so the live index stays queryable.
                fs.rename(hpath(old), hpath(root))
                raise IOError(f"compact: failed to swap in {tmp}")
            self._clear(spark, old)
        return self

    def _postings(self, spark: SparkSession) -> DataFrame:
        self._recover_precompact(spark, self.path)
        return spark.read.parquet(f"{self.path}/shard_*")

    def union(self, spark: SparkSession, keys: list[str]) -> DataFrame:
        """Doc ids matching ANY key (reference Indexer.union,
        dampr/utils/indexer.py:72-92). `token IN (...)` reaches the parquet
        scan as a pushed filter."""
        return (
            self._postings(spark)
            .filter(F.col("token").isin(list(keys)))
            .select("doc_id")
            .distinct()
        )

    def intersect(
        self, spark: SparkSession, keys: list[str], min_match: int = 1
    ) -> DataFrame:
        """Doc ids matching at least ``min_match`` distinct keys (reference
        Indexer.intersect, dampr/utils/indexer.py:94-125 — its GROUP
        BY/HAVING, as a plan)."""
        return (
            self._postings(spark)
            .filter(F.col("token").isin(list(keys)))
            .groupBy("doc_id")
            .agg(F.count_distinct("token").alias("n_matched"))
            .filter(F.col("n_matched") >= min_match)
            .select("doc_id", "n_matched")
        )

    def retrieve(
        self, corpus: DataFrame, hits: DataFrame, id_col: str = "doc_id"
    ) -> DataFrame:
        """Join hit ids back to corpus rows — the reference returns the
        matching *lines*; here a left-semi join (ids broadcast when small)."""
        return corpus.join(
            hits.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
        )

    # -- BM25-ranked retrieval (extension beyond the reference's boolean ops)

    def build_scored(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "Indexer":
        """Build the index with ranking statistics: postings carry term
        frequency ``(token, doc_id, tf)`` and a ``_stats`` sidecar stores
        per-document length plus a 1-row corpus summary — everything BM25
        needs, so queries never touch the corpus text. Boolean ``union`` /
        ``intersect`` work unchanged on a scored index (extra column is
        pruned by the scan)."""
        self._clear(df.sparkSession, self.path)
        self._clear(df.sparkSession, self.path + "_stats")
        return self.append_scored(df, text_col, id_col)

    def append_scored(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "Indexer":
        """Scored-index shard append for NEW documents. BM25's corpus
        statistics (doc count, average length) aggregate at query time over
        the sharded stats sidecar, so scores reflect the grown corpus with
        no rebuild — the appended batch pays only its own pass."""
        spark = df.sparkSession
        self._guard_shard_type(spark, ["token", "doc_id", "tf"])
        ids = self._shard_ids(spark, self.path)
        nxt = (ids[-1] + 1) if ids else 0
        toks = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("token"),
        ).filter(F.col("token") != "")
        postings = toks.groupBy("token", "doc_id").agg(
            F.count(F.lit(1)).cast("double").alias("tf")
        )
        self._write_shard(postings, self.path, nxt)
        dl = df.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.split(F.col(text_col), r"\s+")).cast("double").alias("dl"),
        )
        dl.write.mode("overwrite").parquet(
            f"{self.path}_stats/shard_{nxt:05d}"
        )
        return self

    def search_bm25(
        self,
        spark: SparkSession,
        terms: list[str],
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Top-k documents by BM25 over the query terms, driven ENTIRELY by
        the index: the postings scan is pruned to the query terms (pushed IN
        filter + token bucketing), per-term document frequencies aggregate
        from those postings and broadcast back, doc lengths join from the
        stats sidecar, and the cut is a TakeOrdered heap. Cost scales with
        the query terms' posting lists — never the corpus — which is the
        whole point of an inverted index at 100 TB.

        Identical scoring to the full-scan ``bm25_rank`` catalog query
        (equality-tested in tests/test_api.py); same 4dp-rounded cut
        ordering so the returned set is float-drift-stable."""
        self._recover_precompact(spark, self.path + "_stats")
        stats = spark.read.parquet(f"{self.path}_stats/shard_*")
        corpus = stats.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        p = self._postings(spark).filter(F.col("token").isin(list(terms)))
        df_counts = p.groupBy("token").agg(
            F.count(F.lit(1)).cast("double").alias("df")
        )
        idf = F.log(
            1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        score = (
            idf
            * F.col("tf")
            * (k1 + 1)
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
        return (
            p.join(F.broadcast(df_counts), "token")
            .join(stats, "doc_id")
            .crossJoin(F.broadcast(corpus))
            .groupBy("doc_id")
            .agg(F.round(F.sum(score), 6).alias("bm25"))
            .orderBy(F.round(F.col("bm25"), 4).desc(), F.col("doc_id"))
            .limit(k)
        )

    # -- positional postings + phrase queries (extension beyond the
    #    reference's boolean union/intersect)

    def build_positional(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "Indexer":
        """Positional posting table ``(token, doc_id, pos)`` — every token
        OCCURRENCE with its 0-based position (``posexplode``; no distinct —
        phrase matching needs repeats), written token-hashed and
        token-sorted like :meth:`build` so a phrase query's ``token IN
        (words)`` filter prunes files and row groups the same way."""
        self._clear(df.sparkSession, self.path)
        self._clear(df.sparkSession, self.path + "_stats")
        return self.append_positional(df, text_col, id_col)

    def append_positional(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "Indexer":
        """Positional-index shard append for NEW documents — positions are
        per-document, so shards compose with no rewrite."""
        spark = df.sparkSession
        self._guard_shard_type(spark, ["token", "doc_id", "pos"])
        ids = self._shard_ids(spark, self.path)
        nxt = (ids[-1] + 1) if ids else 0
        postings = df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "token"),
        ).filter(F.col("token") != "")
        self._write_shard(postings.select("token", "doc_id", "pos"), self.path, nxt)
        return self

    def phrase(self, spark: SparkSession, words: list[str]) -> DataFrame:
        """Exact-phrase hits from positional postings: ``(doc_id, start)``
        per occurrence, overlapping occurrences included.

        Slot-union plan — one shuffle, posting lists only: slot ``i``'s
        postings (token = words[i]) each nominate a candidate phrase
        ``start = pos - i``; a (doc, start) where all ``len(words)`` slots
        nominated is a match (each slot nominates a given (doc, start) at
        most once because positions are unique within a doc, so a plain
        count equals the distinct-slot count). Cost scales with the
        phrase words' posting-list sizes — never corpus size — and the
        ``token IN`` filter reaches the parquet scan; the reference's
        SQLite indexer has no positional/phrase capability at all
        (dampr/utils/indexer.py stores key→line with no offsets)."""
        if not words:
            raise ValueError("words must be a non-empty phrase")
        post = self._postings(spark).filter(F.col("token").isin(list(words)))
        slots = None
        for i, w in enumerate(words):
            s = post.filter(F.col("token") == w).select(
                "doc_id", (F.col("pos") - F.lit(i)).alias("start")
            )
            slots = s if slots is None else slots.unionAll(s)
        return (
            slots.filter(F.col("start") >= 0)
            .groupBy("doc_id", "start")
            .agg(F.count(F.lit(1)).alias("_k"))
            .filter(F.col("_k") == len(words))
            .select("doc_id", "start")
        )
