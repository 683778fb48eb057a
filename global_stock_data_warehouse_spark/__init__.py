"""global_stock_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``grissomlin/global-stock-data-warehouse``
(a pandas+sqlite stock-market ETL), re-architected as:

- one unified lakehouse layout (``prices`` fact partitioned by market/date,
  ``info`` dim, ``wmy`` gold partitioned by freq, append-only ``audit``)
  instead of six SQLite shards;
- every dataflow operator of the reference (SURVEY.md §2) as a composable
  DataFrame function that Catalyst can optimize end-to-end;
- scale extensions a 100 TB training-data pipeline needs: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search over embedding
  columns, text analysis, and multimodal column plumbing.

Design stance: declarative DataFrame/SQL everywhere; pandas UDFs only where
built-ins genuinely cannot express the semantics (none are needed for
reference parity — see SURVEY.md §4).
"""

__version__ = "0.1.0"

from global_stock_data_warehouse_spark.session import get_spark  # noqa: F401
