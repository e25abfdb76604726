"""TESTDATA fixture contract: the shapes the catalog queries rely on.

The driver regenerates /root/testdata between rounds and has already
changed physical details once (events.ts shipped as TIMESTAMP(NANOS)
through round 3, TIMESTAMP(MICROS) from round 4 — the readers now branch
on what landed). When a regeneration breaks an assumption, this file
fails with the exact contract violated instead of a pile of deep query
mismatches.
"""

from __future__ import annotations

import duckdb
import pytest

from dampr_spark.sources.readers import TABLES

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal"},
    "supplier": {"s_suppkey", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_type", "p_retailprice"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus"},
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield c
    c.close()


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_required_columns_present(con, table):
    cols = {r[0] for r in con.execute(f"DESCRIBE {table}").fetchall()}
    missing = EXPECTED_COLUMNS[table] - cols
    assert not missing, f"{table} lost columns the catalog reads: {missing}"


def test_every_table_nonempty(con):
    for t in TABLES:
        assert con.execute(f"SELECT count(*) FROM {t}").fetchone()[0] > 0, t


def test_events_ts_is_timestamp_like(con, sf_dir):
    """ts must land as a timestamp type DuckDB can window over; the Spark
    readers (sources/readers.read_table, streaming.read_events_stream)
    branch on nanos-vs-micros, so either unit is in-contract."""
    (dtype,) = [
        r[1] for r in con.execute("DESCRIBE events").fetchall() if r[0] == "ts"
    ]
    assert "TIMESTAMP" in dtype.upper(), dtype


def test_embeddings_are_64d_with_query_vector(con):
    dims = con.execute(
        "SELECT DISTINCT len(embedding) FROM embeddings"
    ).fetchall()
    assert dims == [(64,)], f"ANN plans assume 64-d embeddings, got {dims}"
    # ann_cosine_topk / lsh_ann_topk / ivf_ann_topk probe vec_id = 0.
    assert con.execute("SELECT count(*) FROM embeddings WHERE vec_id = 0").fetchone()[0] == 1


def test_documents_source_format(con):
    """domain_mix_sample parses the numeric suffix of 'src<N>' source ids
    (CAST(substr(source, 4) AS INTEGER)); a renamed source scheme must fail
    here, not as a silent Spark-NULL/DuckDB-error divergence."""
    bad = con.execute(
        "SELECT count(*) FROM documents WHERE source NOT SIMILAR TO 'src[0-9]+'"
    ).fetchone()[0]
    assert bad == 0


def test_events_have_funnel_types(con):
    """event_funnel / stream_click_attribution filter on these literals."""
    types = {
        r[0] for r in con.execute("SELECT DISTINCT event_type FROM events").fetchall()
    }
    assert {"click", "purchase"} <= types, types


def test_lineitem_shipdate_spans_1997(con):
    """filter_where/q1/q6 predicates assume the TPC-H-ish 1995-1998 span."""
    lo, hi = con.execute("SELECT min(l_shipdate), max(l_shipdate) FROM lineitem").fetchone()
    assert str(lo) <= "1997-01-01" <= str(hi), (lo, hi)


def test_documents_ids_cover_audit_budget(con):
    """The minhash/simhash audit checks sample `doc_id % 2 = 0 AND
    doc_id < 1000` — a renumbered id scheme (offset ids, sparse ids) would
    silently shrink the audit to nothing and turn the checks vacuous. The
    budget window must keep a healthy population."""
    n = con.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 2 = 0 AND doc_id < 1000"
    ).fetchone()[0]
    assert n >= 25, f"audit budget window holds only {n} docs"
