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

    ``approx=True`` is the routine-profile scale path: HyperLogLog++
    ``approx_count_distinct`` (rsd 2%) sketches for every column ride ONE
    normal partial/final aggregation — single pass, NO Expand (asserted in
    tests/test_plan_quality.py).

    ``approx=False`` (exact, oracle-comparable) runs ONE aggregation PER
    COLUMN and unions the 1-row results. N sibling ``countDistinct``s in
    a single agg would compile to an Expand replicating every scanned row
    N_cols times; a lone ``countDistinct`` instead uses the two-phase
    partial-distinct strategy, and each per-column plan scans ONLY its own
    column — on columnar storage the N plans together read exactly the
    same bytes as the one-pass version, while shuffling distinct values
    instead of N_cols x |rows| expanded rows.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if approx:
        aggs: list = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            aggs += [
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"),
                F.approx_count_distinct(c, 0.02).alias(f"_dist_{c}"),
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
        ).select(
            "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
        )

    per_col = [
        df.select(F.col(c)).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(c).isNull(), 1)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        ).select(
            F.lit(c).alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out
