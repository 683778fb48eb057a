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


def scan_csv_dir_quarantined(
    spark: SparkSession,
    path: str,
    schema: str,
    id_column: str = "stock_id",
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """`scan_csv_dir` with a dead-letter lane (the scan_json pattern):
    malformed rows land in the quarantine frame with their raw text + the
    source file, instead of becoming silent nulls mid-table. The reference
    swallows per-file parse errors whole (downloader_wmy.py:170-173 bare
    except skips the FILE); here a bad ROW costs one quarantine record and
    the rest of the file still loads.
    """
    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    st_q = StructType(list(st.fields)).add("_corrupt_record", "string")
    df = (
        spark.read.schema(st_q)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "true" if header else "false")
        .csv(path)
        .withColumn("_file", F.input_file_name())
        .cache()  # same QUERY_ONLY_CORRUPT_RECORD_COLUMN escape as scan_json
    )
    stem = F.regexp_extract(F.col("_file"), r"([^/]+)\.csv$", 1)
    raw_id = F.upper(F.trim(F.substring_index(stem, "_", 1)))
    clean = (
        df.filter(F.col("_corrupt_record").isNull())
        .withColumn(id_column, raw_id)
        .drop("_corrupt_record", "_file")
    )
    dead = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_file").alias("source_file"), "_corrupt_record"
    )
    return clean, dead
