"""One-pass data-quality profiling.

Generalizes the reference's monitoring aggregates (`get_db_summary`,
main.py:114-137) into a per-column profile: null count, distinct count,
min/max — ONE scan, one aggregation producing every column's stats as a
single wide row, then unpivoted with ``stack`` (a zero-shuffle local
expand). The naive per-column loop would scan the table N_cols times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    column; min/max rendered as strings so heterogeneous column types fit
    one result schema.

    ``approx=False`` (exact, oracle-comparable) compiles N ``countDistinct``
    aggregates into an Expand that replicates every scanned row N_cols
    times — fine for audits, ruinous as a routine profile at 100 TB.
    ``approx=True`` swaps in HyperLogLog++ ``approx_count_distinct``
    (rsd 2%): one sketch per column rides the normal partial/final
    aggregation, NO Expand, single pass — the plan a recurring profiling
    job should run (asserted in tests/test_plan_quality.py).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    distinct_of = (
        (lambda c: F.approx_count_distinct(c, 0.02)) if approx else F.countDistinct
    )
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"),
            distinct_of(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
