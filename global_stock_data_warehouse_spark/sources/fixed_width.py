"""Fixed-width text source (exchange EOD dump format).

Many exchange end-of-day files ship as fixed-width records rather than
CSV (the reference ingests only CSV/HTML/XLSX; this rounds out the
landing surface for the same class of feeds). One ``spark.read.text``
scan plus a pure-``substring`` projection — every field extraction is a
codegen'd expression fused into the scan's WholeStageCodegen span, so with
``skip_header_lines=0`` the whole parse is map-only, splittable, and
shuffle-free at any scale (a Python row parser here would be the classic
100x UDF mistake). Header skipping is the exception: "the first N lines
of each file" needs a per-file ordering, which costs one hash exchange +
sort on ``input_file_name`` (asserted visible in the plan test); when
headers are recognizable by CONTENT, prefer a map-only filter on the
parsed columns instead.

Typing: extracted slices are trimmed then cast through Spark's standard
cast rules; a malformed numeric field becomes NULL (cast semantics) and
is optionally counted via a ``_corrupt_fields`` column rather than
killing the scan — same dead-letter philosophy as ``scan_json``
(landing.py) and ``scan_csv_dir_quarantined`` (csv_dir.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, start_1_based, length, type) — type is any Spark cast target
ColSpec = tuple[str, int, int, str]


def _file_stats(spark: SparkSession, path) -> tuple[int, int, int]:
    """(largest, total_bytes, n_files) over regular files under ``path``
    via the Hadoop FS metadata listing (driver-side, metadata-only — no
    data read; same listing the scan planner itself performs)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(str(path))
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    biggest = total = count = 0
    while it.hasNext():
        n = it.next().getLen()
        biggest = max(biggest, n)
        total += n
        count += 1
    return biggest, total, count


def _bytes_conf(spark: SparkSession, key: str, default: str) -> int:
    """A byte-valued Spark conf, parsed through Spark's own byte-string
    rules ("128m", "134217728b", ...)."""
    raw = spark.conf.get(key, default)
    try:
        return int(
            spark.sparkContext._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                raw
            )
        )
    except Exception:
        return int("".join(c for c in raw if c.isdigit()) or 134217728)


def _effective_max_split_bytes(
    spark: SparkSession, total_bytes: int, n_files: int
) -> int:
    """The split size the scan planner will ACTUALLY use — Spark's
    ``FilePartition.maxSplitBytes`` formula, not just
    ``maxPartitionBytes``:

        min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))
        where bytesPerCore = (totalBytes + n_files * openCost)
                             / minPartitionNum

    and ``minPartitionNum`` defaults to the session's leaf-node default
    parallelism (the core count on local[N]). On a many-core session
    this is routinely FAR below ``maxPartitionBytes`` — e.g. ~4 MB on
    local[32] over a ~100 MB directory — so a file can be split even
    though it is smaller than ``maxPartitionBytes``. The splittable-file
    guard must compare against THIS number."""
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", "134217728b")
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", "4194304b")
    min_pn = (
        spark.conf.get("spark.sql.files.minPartitionNum", None)
        or spark.conf.get("spark.sql.leafNodeDefaultParallelism", None)
        or spark.sparkContext.defaultParallelism
    )
    padded = total_bytes + n_files * open_cost
    bytes_per_core = padded // max(int(min_pn), 1)
    return min(max_pb, max(open_cost, bytes_per_core))


def scan_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: Sequence[ColSpec],
    skip_header_lines: int = 0,
    corrupt_count_col: str | None = None,
) -> DataFrame:
    """Parse ``path`` (a file or directory of fixed-width text files) into
    typed columns per ``colspecs``.

    ``skip_header_lines`` drops the first N PHYSICAL lines of each file
    without a driver-side read: a per-file ``row_number`` over the
    monotonically-increasing-id order within ``input_file_name`` — the
    window is per-file and header counts are tiny, so this stays
    distributed (files are the parallelism unit, as with any text
    format whose header is positional).

    SPLITTABLE-FILE GUARD: that per-file ordering is only contractual
    when each file lands in ONE scan partition. For a file larger than
    the planner's EFFECTIVE split size Spark splits it, and the line
    order ACROSS splits rides the planner's split sort/bin-packing — an
    implementation detail a planner change could silently break, dropping
    the wrong N lines. The effective split is NOT ``maxPartitionBytes``
    alone: Spark's ``FilePartition.maxSplitBytes`` is
    ``min(maxPartitionBytes, max(openCostInBytes, totalBytes/
    parallelism))``, often far smaller on many-core sessions (see
    ``_effective_max_split_bytes``). So ``skip_header_lines > 0``
    refuses loudly (ValueError) when any input file exceeds the
    effective split size; for such feeds, filter headers by CONTENT on
    the parsed columns (a map-only predicate that needs no ordering at
    all), or raise the relevant confs past the largest file.

    When ``corrupt_count_col`` is set, it receives the number of fields
    whose raw slice was non-empty but cast to NULL — the row-level
    malformedness signal callers route to quarantine.
    """
    from pyspark.sql import Window

    lines = spark.read.text(str(path))
    if skip_header_lines:
        biggest, total, n_files = _file_stats(spark, path)
        max_split = _effective_max_split_bytes(spark, total, n_files)
        if biggest > max_split:
            raise ValueError(
                f"scan_fixed_width(skip_header_lines={skip_header_lines}): an "
                f"input file under {path!r} is {biggest} bytes, larger than "
                f"the planner's effective split size ({max_split} bytes — "
                "min(spark.sql.files.maxPartitionBytes, max(openCostInBytes, "
                "totalBytes/parallelism)), Spark's FilePartition.maxSplitBytes "
                "formula); Spark will split it and per-file line order across "
                "splits is not a contract. Filter headers by content on the "
                "parsed columns, or raise maxPartitionBytes AND "
                "minPartitionNum/openCostInBytes so the effective split "
                "exceeds the largest file."
            )
        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        lines = (
            lines.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > skip_header_lines)
            .drop("_rn")
        )
    cols = []
    corrupt_terms = []
    for name, start, length, dtype in colspecs:
        raw = F.trim(F.substring(F.col("value"), start, length))
        typed = F.when(raw == "", None).otherwise(raw).cast(dtype)
        cols.append(typed.alias(name))
        if corrupt_count_col is not None and dtype.lower() not in ("string",):
            corrupt_terms.append(
                ((raw != "") & typed.isNull()).cast("int")
            )
    if corrupt_count_col is not None:
        counter = (
            sum(corrupt_terms, F.lit(0)) if corrupt_terms else F.lit(0)
        )
        cols.append(counter.alias(corrupt_count_col))
    return lines.select(*cols)
