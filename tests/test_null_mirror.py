"""NULL-injected oracle-mirror regression: the driver fixtures carry no
NULLs in documents.source/n_chars or events.ts/value, so a Spark operator
and its DuckDB oracle could encode DIFFERENT NULL contracts and still pass
the gate (the r7 ADVICE flagged exactly this for decay_weighted,
term_chi2, and length_ks_drift). This test rebuilds the tables WITH NULL
rows in a tmp sf-dir and re-runs the spark query against the oracle SQL
side-by-side, so any contract divergence surfaces here instead of on the
first NULL-bearing production fixture."""

from __future__ import annotations

import math
import os

import duckdb
import pytest


def _norm(rows, cols):
    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == 0:
                return 0.0
            return round(v, 9 - int(math.floor(math.log10(abs(v)))) - 1)
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        return v

    return (
        sorted(
            (tuple(cell(v) for v in row) for row in rows),
            key=lambda r: tuple(repr(v) for v in r),
        ),
        sorted(c.lower() for c in cols),
    )


def _compare(spark, con, name, sf_dir):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, str(sf_dir))
    srows, scols = [tuple(r) for r in sdf.collect()], sdf.columns
    cur = con.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    sn, sc = _norm(srows, scols)
    dn, dc = _norm(drows, dcols)
    assert sc == dc, f"{name}: schema spark={sc} duck={dc}"
    assert len(sn) == len(dn), f"{name}: rows spark={len(sn)} duck={len(dn)}"
    diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
    assert not diffs, f"{name}: value diffs {diffs}"


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    """sf0.001 documents + events with NULL rows injected into exactly the
    columns whose exclusion contracts the operators document."""
    import __spark_entry__ as entrymod

    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("null_sf")
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    null_docs = spark.createDataFrame(
        [
            (900001, "null source doc words here", "en", None, 25),
            (900002, "null nchars doc", "en", "web", None),
            (900003, None, "en", "web", 0),
            (900004, "fully null meta", None, None, None),
        ],
        docs.schema,
    )
    docs.unionByName(null_docs).write.parquet(
        str(out / "documents.parquet"), mode="overwrite"
    )
    ev = entrymod._t(spark, src, "events")
    null_ev = spark.createDataFrame(
        [
            (900001, None, 1, "click", 50.0, "{}"),
            (900002, __import__("datetime").datetime(2024, 1, 2), 1, "click", None, "{}"),
            (900003, None, None, None, None, None),
        ],
        ev.schema,
    )
    ev.unionByName(null_ev).write.parquet(
        str(out / "events.parquet"), mode="overwrite"
    )
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        )
    return out, con


def test_decay_weighted_null_mirror(spark, null_sf_dir):
    out, con = null_sf_dir
    _compare(spark, con, "decay_weighted", out)


def test_term_chi2_null_mirror(spark, null_sf_dir):
    out, con = null_sf_dir
    _compare(spark, con, "term_chi2", out)


def test_length_ks_drift_null_mirror(spark, null_sf_dir):
    out, con = null_sf_dir
    _compare(spark, con, "length_ks_drift", out)


def test_text_stats_null_mirror(spark, null_sf_dir):
    # the r7 NULL-text root normalization, now exercised against its oracle
    out, con = null_sf_dir
    _compare(spark, con, "text_stats", out)
