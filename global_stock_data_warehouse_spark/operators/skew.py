"""Skew-resilient join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only splits SORT-MERGE join partitions; a pathologically
hot key inside a shuffled hash join, or a deliberate pre-partitioned
layout, still needs classic salting. The pattern:

    left (skewed):  salt = pmod(hash(<all left cols>), factor)  — spreads
                    each hot key's rows over `factor` subpartitions
    right:          exploded `factor` times, one copy per salt value
    join on        (key, salt) — hot keys now occupy `factor` tasks

Deterministic salting (hash of the row, not rand()) keeps retries and
speculative tasks consistent — rand() salting breaks exactly-once task
retry semantics because a re-executed task would re-salt differently.

Cost model: right side is replicated `factor` x — use for fact x mid-size
joins where the right side is too big to broadcast but cheap to replicate
relative to the skewed shuffle it removes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``factor``
    salt partitions and the right side replicated to match.

    The salt must differ WITHIN a hot key's rows — hashing non-key columns
    does that; when the left side has only key columns, hashing the keys
    would give every row of a hot key the SAME salt (no spreading, pure
    replication overhead), so we fall back to a per-partition row index
    (deterministic given a fixed input partitioning: task retries re-read
    the same partition in the same order, unlike rand() salting).
    """
    keys = [on] if isinstance(on, str) else list(on)
    non_key = [c for c in left.columns if c not in keys]
    if non_key:
        salt = F.pmod(F.hash(*[F.col(c) for c in non_key]), F.lit(factor))
    else:
        salt = F.pmod(F.spark_partition_id() * 104729 + F.monotonically_increasing_id(), F.lit(factor))
    salted_l = left.withColumn("_salt", salt)
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    return salted_l.join(salted_r, [*keys, "_salt"], how).drop("_salt")
