"""Join operators (SURVEY.md §2.3): broadcast lookup, anti/semi monitoring joins.

J1 (industry lookup) and J2 (prices x info) are fact-x-dim equi-joins; the
dim side is thousands of rows even at 100 TB fact scale, so we pin
``broadcast`` — no shuffle of the fact table at all. The anti/semi pair
formalizes the reference's coverage/fail_list monitoring (symbols in the dim
with no fact rows, main.py:118-119 intent) as real relational ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def broadcast_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    coalesce_cols: dict[str, tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Left join a small dim with optional per-column coalesce-defaulting.

    ``coalesce_cols`` maps output name -> (dim_col, fact_col, default), the
    KR industry-lookup pattern: prefer the looked-up attribute, fall back to
    the fact's own, else a literal default (downloader_kr.py:80-82 intent).
    """
    keys = [on] if isinstance(on, str) else list(on)
    out = facts.join(broadcast(dim), keys, "left")
    for name, (dim_col, fact_col, default) in (coalesce_cols or {}).items():
        out = out.withColumn(name, F.coalesce(F.col(dim_col), F.col(fact_col), F.lit(default)))
    return out


def anti_missing(dim: DataFrame, facts: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Dim rows with NO matching facts (coverage gaps / fail_list)."""
    keys = [on] if isinstance(on, str) else list(on)
    return dim.join(facts, keys, "left_anti")


def semi_active(dim: DataFrame, facts: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Dim rows with at least one matching fact (active universe)."""
    keys = [on] if isinstance(on, str) else list(on)
    return dim.join(facts, keys, "left_semi")
