"""Sources: scans over landing-zone files and the driver's parquet tables.

The reference ingests via HTML/Excel/JSON scrapes, SQLite shards, and a
per-symbol time-series API (SURVEY.md §2.1 S1-S7). The engine's contract:
external FETCHERS land raw bytes in a landing zone; every DECODE from
there on is a distributed scan — stdlib codecs over ``binaryFile`` for
HTML tables (`html_table.py`) and xlsx (`excel.py`), rowid-partitioned
stdlib sqlite3 for legacy shards (`sqlite_scan.py`), and declarative
explicit-schema scans (pushdown/pruning-friendly) for CSV/JSON/parquet.
"""

from global_stock_data_warehouse_spark.sources.registry import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
)
from global_stock_data_warehouse_spark.sources.csv_dir import scan_csv_dir  # noqa: F401
from global_stock_data_warehouse_spark.sources.excel import scan_excel  # noqa: F401
from global_stock_data_warehouse_spark.sources.html_table import scan_html_table  # noqa: F401
from global_stock_data_warehouse_spark.sources.sqlite_scan import (  # noqa: F401
    migrate_sqlite_to_parquet,
    scan_sqlite,
)
