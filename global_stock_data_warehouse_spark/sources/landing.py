"""Landing-zone sources: JSON scan with quarantine, header-detection prep.

The reference pulls symbol universes from HTML tables, REST JSON, and .xls
sheets (downloader_us.py:48-60, downloader_hk.py:56-89). The engine's
stance (SURVEY §2.1): external FETCH happens outside the engine; the engine
SCANS a landing zone with explicit schemas. Two pieces live here:

- ``scan_json``: S2 as a first-class scan — explicit StructType (never
  inferSchema: a schema-inference pass is a full extra read at 100 TB, and
  inferred types drift run-to-run), PERMISSIVE mode with a
  ``_corrupt_record`` column so malformed rows quarantine instead of
  killing the job (the engine-level replacement for the reference's bare
  try/except row skips).
- ``detect_header_rows``: S3's dynamic header-row detection
  (downloader_hk.py:74-86 scans the first 20 rows for "Stock Code"/"Short
  Name") as a pure, testable function over a row grid. It runs driver-side
  during ingest prep — binary .xls parsing is not a distributed concern
  (files are small dimension sheets), and the xls codec itself is not in
  this environment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def scan_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Scan landing JSON with an explicit schema.

    Returns (clean rows, quarantined raw records). Corrupt rows carry the
    raw text in ``_corrupt_record`` for dead-letter triage.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # copy before adding: StructType.add() mutates in place, so appending to
    # a caller-supplied schema would permanently grow their object
    schema_q = StructType(list(schema.fields)).add("_corrupt_record", "string")
    df = (
        spark.read.schema(schema_q)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", "true" if multiline else "false")
        .json(path)
    )
    # Spark forbids referencing ONLY the corrupt-record column of a raw
    # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented escape
    # hatch is caching the parsed scan. Landing batches are ingest-sized,
    # so the cache is the cheap price of dead-letter visibility.
    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    dead = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return clean, dead


def detect_header_rows(
    grid: Sequence[Sequence[object]],
    required_tokens: Sequence[str],
    scan_rows: int = 20,
) -> int:
    """Find the header row index in a raw sheet grid.

    Returns the index of the first row (within the first ``scan_rows``)
    containing ALL ``required_tokens`` as cell substrings
    (case-insensitive, NBSP-normalized — downloader_hk.py:76,86 cleanup).
    Raises ValueError if absent: a silent wrong-header parse corrupts every
    downstream row, so fail loudly.
    """
    toks = [t.lower() for t in required_tokens]
    for i, row in enumerate(grid[:scan_rows]):
        cells = [str(c).replace("\xa0", " ").strip().lower() for c in row]
        if all(any(t in c for c in cells) for t in toks):
            return i
    raise ValueError(
        f"no header row with tokens {list(required_tokens)} in first {scan_rows} rows"
    )


def grid_to_records(
    grid: Sequence[Sequence[object]],
    required_tokens: Sequence[str],
    scan_rows: int = 20,
) -> tuple[list[str], list[list[object]]]:
    """(columns, data rows) below the detected header — ingest-prep output
    ready for ``spark.createDataFrame(rows, schema)``."""
    h = detect_header_rows(grid, required_tokens, scan_rows)
    cols = [str(c).replace("\xa0", " ").strip() for c in grid[h]]
    return cols, [list(r) for r in grid[h + 1 :]]
