"""Directory-of-CSVs source with filename-derived entity IDs.

Re-expresses the reference's per-file loop (glob + pd.read_csv + filename
stem -> StockID, downloader_wmy.py:135,17-19,90-91) as ONE distributed scan:
``spark.read.csv`` over the whole directory plus ``input_file_name()`` +
``regexp_extract`` to attach the file-derived ID to every row. At 100 TB
this is the difference between a driver-side file loop and a single
partition-parallel job (one small CSV ~ one task; Spark packs small files
into splits via ``maxPartitionBytes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_csv_dir(
    spark: SparkSession,
    path: str,
    schema: str,
    id_column: str = "stock_id",
    header: bool = True,
) -> DataFrame:
    """Read ``path/*.csv`` with an explicit schema and attach the filename
    stem's leading token (``{id}_anything.csv`` -> ``id``) as ``id_column``.

    Mirrors reference semantics: stem.split('_')[0], uppercased/trimmed
    canonical ID (downloader_wmy.py:17-23).
    """
    df = spark.read.csv(path, schema=schema, header=header)
    stem = F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1)
    raw_id = F.substring_index(stem, "_", 1)
    return df.withColumn(id_column, F.upper(F.trim(raw_id)))
