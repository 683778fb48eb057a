"""Sources: scans over landing-zone files and the driver's parquet tables.

The reference ingests via HTML/Excel/JSON scrapes and a per-symbol
time-series API (SURVEY.md §2.1 S1-S7). Spark has no native HTML/XLS
source, so the engine's contract is: external fetchers land raw bytes as
parquet/CSV/JSON in a landing zone, and everything from the landing zone on
is a declarative scan with explicit schema — predicate-pushdown- and
column-pruning-friendly.
"""

from global_stock_data_warehouse_spark.sources.registry import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
)
from global_stock_data_warehouse_spark.sources.csv_dir import scan_csv_dir  # noqa: F401
