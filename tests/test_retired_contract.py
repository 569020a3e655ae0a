"""Queries retired from the 50-entry driver contract stay part of the
engine's verified surface: those with engine-portable semantics are
cross-checked against their DuckDB oracles here (same normalize/compare as
tools/check_oracle.py), and the hash-seeded production twins must keep
running (their pair-set equality vs the in-contract md5 twins is asserted in
tests/test_docs_ops.py)."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry
from tools.check_oracle import TABLES, _normalize


def test_retired_queries_still_exact(spark, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, sqls = entry.retired_queries(), entry.retired_oracle_sql()
    assert set(sqls) <= set(qs)
    for name, sql in sqls.items():
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.execute(sql).df()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        sh, sn = _normalize(sdf)
        oh, on = _normalize(odf)
        assert sn == on, f"{name}: rowcount {sn} vs {on}"
        assert sh == oh, f"{name}: value hash mismatch ({sn} rows)"


def test_retired_hash_seeded_twins_run(spark, sf_dir):
    qs = entry.retired_queries()
    for name in set(qs) - set(entry.retired_oracle_sql()):
        assert qs[name](spark, sf_dir).count() >= 0, name
