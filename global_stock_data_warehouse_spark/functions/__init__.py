"""Scalar expression helpers (SURVEY.md §2.8 F1-F13, §2.5 bucketing).

Everything here is a pure Column-in/Column-out expression builder — no UDFs,
so every helper stays inside whole-stage codegen and is pushdown-eligible.
"""

from global_stock_data_warehouse_spark.functions.buckets import (  # noqa: F401
    month_end,
    week_ending_friday,
    year_end,
)
from global_stock_data_warehouse_spark.functions.normalize import (  # noqa: F401
    canonical_id,
    clean_code_digits,
    code_with_suffix,
    default_if_missing,
    status_flag,
    zero_pad,
)
