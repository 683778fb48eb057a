"""NULL-injected oracle-mirror regression: the driver fixtures carry no
NULLs in documents.source/n_chars/text or events.user_id/ts/value, so a
Spark operator and its DuckDB oracle can encode DIFFERENT NULL contracts
and still pass the gate. The r8 sweep (tools/null_sweep.py) found 28
such divergences; this suite pins one representative query per fixed
family so a regression surfaces here instead of on the first NULL-
bearing production fixture. The full 155-query sweep remains a tool run
(~4 min), not a per-commit test."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))


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


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    """sf0.001 tables with NULLs injected into exactly the columns whose
    exclusion/normalization contracts the operators document (same
    injection as tools/null_sweep.py — one definition, imported)."""
    from null_sweep import build_null_dir

    out = tmp_path_factory.mktemp("null_sf")
    build_null_dir(spark, str(out))
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        p = os.path.join(str(out), f"{t}.parquet")
        glob = (
            f"{p}/*.parquet"
            if os.path.isdir(p) and not os.path.islink(p)
            else p
        )
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )
    return str(out), con


# one per fixed family:
#   text root normalization  -> text_stats, chunk_documents, dedup_exact,
#                               pii_scrub (engine concat-NULL divergence)
#   NULL agg-column exclusion-> decay_weighted, term_chi2, length_ks_drift
#   bar family (_event_bars / daily_close) -> wmy_weekly, market_breadth
#   session family           -> sessionize
#   timeline family          -> scd2_history
#   quota pollution          -> temperature_sample
FAMILY_PINS = [
    "text_stats",
    "chunk_documents",
    "dedup_exact",
    "pii_scrub",
    "decay_weighted",
    "term_chi2",
    "length_ks_drift",
    "wmy_weekly_resample_returns",
    "market_breadth",
    "sessionize",
    "scd2_history",
    "temperature_sample",
]


@pytest.mark.parametrize("name", FAMILY_PINS)
def test_null_mirror(spark, null_sf_dir, name):
    import __spark_entry__ as entrymod

    out, con = null_sf_dir
    sdf = entrymod.queries()[name](spark, out)
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
