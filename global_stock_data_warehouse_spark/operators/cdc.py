"""Change-data capture between keyed snapshots.

The reference tracks change as a boolean (`has_changed`,
`downloader_us.py:173-177`) and re-uploads whole DB files. The engine
version is row-level CDC: full-outer join two snapshots on the PK and
classify every row as insert / update / delete — the input you need for
incremental downstream sync (Delta CDF semantics without Delta).

Scale: ONE shuffle on the PK (both sides hash-partitioned by the join),
null-safe column comparison entirely in codegen, and unchanged rows —
the overwhelming majority of a 100 TB snapshot pair — are filtered
before anything is materialized downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows that changed between snapshots, classified in ``change_type``
    ('insert' | 'update' | 'delete') with ``old_<c>`` / ``new_<c>`` value
    pairs. Unchanged rows never leave the join stage."""
    keys = list(key_cols)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in new.columns if c not in keys
    ]
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in cols]).withColumn(
        "_in_old", F.lit(True)
    )
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in cols]).withColumn(
        "_in_new", F.lit(True)
    )
    j = o.join(n, keys, "full_outer")
    differs = None
    for c in cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(differs if differs is not None else F.lit(False), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in cols],
            *[f"new_{c}" for c in cols],
        )
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Apply a ``snapshot_diff``-shaped changeset (``change_type`` +
    ``new_<c>`` columns) to a keyed snapshot — the downstream half of
    CDC: ``apply_changes(old, snapshot_diff(old, new)) == new`` exactly
    (round-trip property-tested).

    One shuffle on the PK (left-anti drop of deleted/updated keys union
    the upserted rows; both sides hash-partition on the same key).
    Deletes drop, updates replace, inserts append — unchanged rows pass
    through untouched, so the work scales with |changes|, not |table|.
    """
    keys = list(key_cols)
    value_cols = [c for c in snapshot.columns if c not in keys]
    upserts = changes.filter(F.col("change_type").isin("insert", "update")).select(
        *keys, *[F.col(f"new_{c}").alias(c) for c in value_cols]
    )
    touched = changes.select(*keys)
    kept = snapshot.join(touched, keys, "left_anti")
    return kept.unionByName(upserts)


def scd2_history(
    events: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a keyed change
    stream: collapse consecutive duplicate values, then emit one row per
    value EPISODE with ``valid_from`` / ``valid_to`` (null = current) and
    ``is_current`` — the dimension-history sibling of ``snapshot_diff``
    (that compares two snapshots; this builds the full timeline).

    ONE hash shuffle on ``key_cols``: the duplicate-collapse lag window,
    the episode-closing lead window, and the ordering all reuse the same
    partitioning. Null-safe value compare, so NULL is a legitimate
    tracked value (NULL -> 'x' -> NULL yields three episodes). A change
    record with a NULL key or NULL timestamp, however, cannot be placed
    on any timeline — those rows are excluded up front (engines also
    order NULL timestamps oppositely, so keeping them would make the
    episode boundaries engine-dependent).
    """
    keys = list(key_cols)
    nn = F.col(ts_col).isNotNull()
    for k in keys:
        nn = nn & F.col(k).isNotNull()
    events = events.filter(nn)
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak_cols)
    prev_ts = F.lag(ts_col).over(w)
    prev_v = F.lag(value_col).over(w)
    is_start = prev_ts.isNull() | ~F.col(value_col).eqNullSafe(prev_v)
    episodes = (
        events.select(*keys, ts_col, *tiebreak_cols, value_col)
        .withColumn("_is_start", is_start)
        .filter(F.col("_is_start"))
    )
    w2 = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak_cols)
    return (
        episodes.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            *keys,
            F.col(value_col).alias("value"),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def _row_hash(cols: Sequence[str]):
    """Null-unambiguous row hash: Spark's multi-arg xxhash64 SKIPS null
    inputs in its fold, so (NULL, 'a') and ('a', NULL) would collide on
    adjacent columns. Interleaving each value with its is-null flag
    (booleans are never null, so every column always contributes) makes
    the fold sequence unique per (value, null-pattern)."""
    if not cols:
        # keys-only diff (pure membership): constant hash makes every
        # matched key 'unchanged', leaving only inserts/deletes — the
        # same semantics the exact diff's empty-differs branch has
        return F.xxhash64(F.lit(0))
    parts = []
    for c in cols:
        parts.append(F.col(c))
        parts.append(F.col(c).isNull())
    return F.xxhash64(*parts)


def _measured_bytes(df: DataFrame, per_row_overhead: int = 16) -> int:
    """Actual serialized-size estimate of a (small) frame: sum of
    per-column byte widths — octet length for strings/binary, fixed
    widths by type otherwise — plus a per-row object overhead. One
    aggregate action; callers use it to gate a forced broadcast on
    BYTES rather than rows (a 5M-row cap is 40 MB of bigints but can be
    hundreds of MB of composite string keys)."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        MapType,
        ShortType,
        StringType,
        StructType,
    )

    widths = {
        BooleanType: 1, ByteType: 1, ShortType: 2, IntegerType: 4,
        FloatType: 4, DateType: 4, DoubleType: 8, DecimalType: 16,
    }
    per_row = F.lit(per_row_overhead)
    for f in df.schema.fields:
        if isinstance(f.dataType, (StringType, BinaryType)):
            per_row = per_row + F.coalesce(
                F.octet_length(F.col(f.name)), F.lit(0)
            ) + F.lit(4)
        elif isinstance(f.dataType, (ArrayType, MapType, StructType)):
            # Composite columns were previously mis-sized at the 8-byte
            # scalar default, grossly under-measuring array/struct key
            # sets and wrongly forcing them broadcast (ADVICE r8).
            # to_json gives a measurable serialized width — an
            # over-estimate vs Tungsten's binary layout, which is the
            # safe direction for a broadcast gate.
            per_row = per_row + F.coalesce(
                F.octet_length(F.to_json(F.col(f.name))), F.lit(0)
            ) + F.lit(8)
        else:
            per_row = per_row + F.lit(
                widths.get(type(f.dataType), 8)  # long/timestamp/other: 8
            )
    row = df.agg(F.sum(per_row).alias("b")).collect()[0]
    return int(row["b"] or 0)


def snapshot_diff_hashed(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    broadcast_changed_max: int = 32 << 20,
) -> DataFrame:
    """:func:`snapshot_diff` for WIDE tables — identical output, different
    physical plan. The plain diff full-outer-joins the snapshots, so the
    shuffle carries every payload column of BOTH sides; at 100 TB with a
    100-column table that is the whole table twice over the wire to
    discover that 0.1% of rows changed. This variant:

    1. shuffles only ``(keys, xxhash64(values+null-flags))`` — the
       narrow pass is key width + 8 bytes regardless of payload width;
    2. classifies insert/update/delete on the hash compare;
    3. fetches payloads ONLY for changed keys — and since churn is small
       relative to the table, the changed-key set is BROADCAST through
       the two payload lookups (dispatched on MEASURED key bytes vs
       ``broadcast_changed_max``, default 32 MiB — a row-count cap would
       mis-size wide composite/string keys, the same lesson as
       ``embedding_neardup_lsh``'s ``carry_max_bytes``; past it, shuffled
       joins are the honest fallback), so the wide snapshots are scanned
       map-side and never shuffled at all.

    Trade: a hash collision between two DIFFERENT payloads of the same
    key (p ~ 2^-64 per changed key) would classify an update as
    unchanged. The interleaved null flags in :func:`_row_hash` remove
    the systematic null-shift collision Spark's bare multi-arg xxhash64
    has. Equivalence to the exact diff is property-tested
    (tests/test_cdc_profile.py).
    """
    keys = list(key_cols)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in new.columns if c not in keys
    ]
    oh = old.select(*keys, _row_hash(cols).alias("_ho"))
    nh = new.select(*keys, _row_hash(cols).alias("_hn"))
    j = oh.join(nh, keys, "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), F.lit("insert"))
        .when(F.col("_hn").isNull(), F.lit("delete"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("update"))
    )
    changed = (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
        .localCheckpoint(eager=True)
    )
    ckeys = changed.select(*keys)
    # a left join cannot broadcast its LEFT side, so the broadcast rides
    # the SEMI joins instead: the wide snapshots are pruned to changed
    # rows map-side (broadcast semi = filter, zero snapshot shuffle),
    # and the final assembly joins run on churn-sized frames. The
    # dispatch measures actual key BYTES over the (checkpointed,
    # churn-sized) changed set — one cheap action replacing the old
    # row count, immune to wide composite / long-string keys.
    c_b = (
        F.broadcast(ckeys)
        if _measured_bytes(ckeys) <= broadcast_changed_max
        else ckeys
    )
    o_vals = old.select(*keys, *[F.col(x).alias(f"old_{x}") for x in cols]).join(
        c_b, keys, "left_semi"
    )
    n_vals = new.select(*keys, *[F.col(x).alias(f"new_{x}") for x in cols]).join(
        c_b, keys, "left_semi"
    )
    out = changed.join(o_vals, keys, "left").join(n_vals, keys, "left")
    return out.select(
        *keys,
        "change_type",
        *[f"old_{x}" for x in cols],
        *[f"new_{x}" for x in cols],
    )


def maintain_agg(
    base_agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: apply a
    :func:`snapshot_diff`-shaped changeset to a (group -> count, sums)
    aggregate WITHOUT rescanning the base table — the classic
    delta-maintenance identity for distributive aggregates
    (count/sum: insert contributes +new, delete -old, update
    new-old; groups whose count reaches zero are dropped). The work
    scales with |changes|, not |table| — the difference between a
    dashboard refresh reading a 100 TB fact table and reading a 100 MB
    changeset.

    ``sum_cols`` must be EXACT types (BIGINT/decimal fixed-point, e.g.
    cents): float sums are not associative, so a float-maintained
    aggregate would drift from a recompute by summation order — with
    integers ``maintain_agg(agg(old), diff(old,new)) == agg(new)``
    bit-exactly (property the demo query's oracle checks end-to-end).

    Plan: one groupBy over the changeset (map-side partials), one
    full-outer join against the base aggregate on the group key —
    co-partitioned when the base agg is stored hash-distributed on the
    same key. Min/max are NOT maintainable this way (a deleted max needs
    the base rows); route those to a recompute of touched groups."""
    keys = list(group_cols)
    per_row = []
    sign_new = F.when(
        F.col("change_type").isin("insert", "update"), F.lit(1)
    ).otherwise(F.lit(0))
    sign_old = F.when(
        F.col("change_type").isin("delete", "update"), F.lit(-1)
    ).otherwise(F.lit(0))
    # an update may MOVE a row between groups: emit the -old contribution
    # at the OLD group key and the +new at the NEW key
    old_side = changes.select(
        *[F.col(f"old_{k}").alias(k) if f"old_{k}" in changes.columns else F.col(k) for k in keys],
        sign_old.alias("_dn"),
        *[(sign_old * F.coalesce(F.col(f"old_{c}"), F.lit(0))).alias(f"_d_{c}") for c in sum_cols],
    )
    new_side = changes.select(
        *[F.col(f"new_{k}").alias(k) if f"new_{k}" in changes.columns else F.col(k) for k in keys],
        sign_new.alias("_dn"),
        *[(sign_new * F.coalesce(F.col(f"new_{c}"), F.lit(0))).alias(f"_d_{c}") for c in sum_cols],
    )
    delta = (
        old_side.unionByName(new_side)
        .filter(F.col("_dn") != 0)
        .groupBy(*keys)
        .agg(
            F.sum("_dn").alias("_dn"),
            *[F.sum(f"_d_{c}").alias(f"_d_{c}") for c in sum_cols],
        )
    )
    # NULL-SAFE key join: groupBy treats NULL as a real group, so the
    # maintenance identity must too — a plain equi-join would strand a
    # NULL-keyed base row and its NULL-keyed delta on opposite sides of
    # the full outer, silently keeping the stale aggregate (and dropping
    # the delta whenever its net count is zero).
    import functools
    import operator

    b, d = base_agg.alias("_b"), delta.alias("_d")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"_b.{k}").eqNullSafe(F.col(f"_d.{k}")) for k in keys],
    )
    j = b.join(d, cond, "full_outer")
    out = j.select(
        *[
            F.coalesce(F.col(f"_b.{k}"), F.col(f"_d.{k}")).alias(k)
            for k in keys
        ],
        (F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))).alias(count_col),
        *[
            (F.coalesce(F.col(f"_b.{c}"), F.lit(0)) + F.coalesce(F.col(f"_d._d_{c}"), F.lit(0))).alias(c)
            for c in sum_cols
        ],
    )
    return out.filter(F.col(count_col) > 0)
