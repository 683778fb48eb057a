"""CDC snapshot diff classification + one-pass profiler."""

from pyspark.sql import functions as F

from global_stock_data_warehouse_spark.operators.cdc import snapshot_diff
from global_stock_data_warehouse_spark.operators.profile import profile_table


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, 40.0), (5, 50.0)], "k long, v double"
    )
    got = {r.k: (r.change_type, r.old_v, r.new_v) for r in
           snapshot_diff(old, new, ("k",)).collect()}
    # k=3 null==null (null-safe -> unchanged), k=4 equal -> both absent
    assert got == {
        1: ("delete", 10.0, None),
        2: ("update", 20.0, 25.0),
        5: ("insert", None, 50.0),
    }


def test_profile_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "id long, s string"
    )
    got = {r.column_name: r for r in profile_table(df).collect()}
    assert got["id"].n_rows == 3
    assert (got["id"].n_nulls, got["id"].n_distinct) == (0, 2)
    assert (got["id"].min_value, got["id"].max_value) == ("1", "2")
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)


def test_apply_changes_roundtrip(spark):
    """apply_changes(old, snapshot_diff(old, new)) == new — the CDC
    round-trip identity, including insert, update, delete, and untouched
    rows."""
    from global_stock_data_warehouse_spark.operators.cdc import (
        apply_changes,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    diff = snapshot_diff(old, new, ["k"])
    rebuilt = apply_changes(old, diff, ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))
    # empty changeset: identity
    same = apply_changes(old, snapshot_diff(old, old, ["k"]), ["k"])
    assert sorted(map(tuple, same.collect())) == sorted(map(tuple, old.collect()))


def test_scd2_history_episodes_and_null_values(spark):
    import datetime as dt

    from global_stock_data_warehouse_spark.operators.cdc import scd2_history

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, 1, t0, "bronze"),
            (2, 1, t0 + dt.timedelta(days=1), "bronze"),   # duplicate -> collapsed
            (3, 1, t0 + dt.timedelta(days=2), "silver"),
            (4, 1, t0 + dt.timedelta(days=3), None),       # NULL is a tracked value
            (5, 1, t0 + dt.timedelta(days=4), "silver"),
            (6, 2, t0, "gold"),
        ],
        ["event_id", "user_id", "ts", "tier"],
    )
    rows = sorted(
        scd2_history(ev, ["user_id"], "tier", tiebreak_cols=["event_id"]).collect(),
        key=lambda r: (r.user_id, r.valid_from),
    )
    u1 = [(r.value, r.valid_from.day, r.valid_to.day if r.valid_to else None, r.is_current)
          for r in rows if r.user_id == 1]
    assert u1 == [
        ("bronze", 1, 3, False),
        ("silver", 3, 4, False),
        (None, 4, 5, False),
        ("silver", 5, None, True),
    ]
    u2 = [r for r in rows if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current


def test_skew_report_stats(spark):
    from global_stock_data_warehouse_spark.operators.profile import skew_report

    # key 'hot' has 6 rows, 'a'..'d' one each: n_rows=10, n_keys=5,
    # max=6, p50=1, top1_share=0.6, skew_ratio = 6/(10/5) = 3.
    rows = [("hot",)] * 6 + [("a",), ("b",), ("c",), ("d",)]
    df = spark.createDataFrame(rows, ["k"])
    r = skew_report(df, keys=["k"], top_n=2).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_key_rows) == (10, 5, 6)
    assert r.p50_key_rows == 1.0
    assert r.top1_share == 0.6
    assert r.topn_share == 0.7  # hot(6) + a(1)
    assert r.skew_ratio == 3.0


def test_skew_report_share_invariants(spark):
    import random

    from global_stock_data_warehouse_spark.operators.profile import skew_report

    rng = random.Random(5)
    rows = [(f"k{rng.randint(0, 30)}",) for _ in range(500)]
    r = skew_report(spark.createDataFrame(rows, ["k"]), keys=["k"], top_n=5).collect()[0]
    # structural invariants: shares ordered and bounded, ratio >= 1
    assert 0 < r.top1_share <= r.topn_share <= 1.0
    assert r.skew_ratio >= 1.0
    assert r.max_key_rows >= r.p50_key_rows >= 1
    assert r.n_rows == 500 and r.n_keys <= 31


def test_benford_audit_flags_synthetic_digits(spark):
    import random

    from global_stock_data_warehouse_spark.operators.profile import benford_audit

    rng = random.Random(9)
    # log-uniform amounts are Benford-conforming -> small deviations
    natural = [(10 ** rng.uniform(0, 4),) for _ in range(4000)]
    out = {r.digit: r for r in benford_audit(
        spark.createDataFrame(natural, ["v"]), "v").collect()}
    assert set(out) == set(range(1, 10))
    assert all(r.deviation < 0.05 for r in out.values())
    assert out[1].observed > out[9].observed  # monotone-ish Benford shape
    # fabricated data with a hard '5' prefix -> massive digit-5 spike
    fake = [(5000.0 + rng.random(),) for _ in range(500)]
    spike = {r.digit: r for r in benford_audit(
        spark.createDataFrame(fake, ["v"]), "v").collect()}
    assert spike[5].observed == 1.0 and spike[5].deviation > 0.9
    # absent digits (the strongest fabrication signal) still report a row:
    # n=0, observed=0, deviation == expected — never silently vanish
    assert set(spike) == set(range(1, 10))
    for d in range(1, 10):
        if d != 5:
            assert spike[d].n == 0 and spike[d].observed == 0.0
            assert spike[d].deviation == spike[d].expected


def test_benford_audit_empty_input_contract(spark):
    """Zero qualifying rows (empty frame, or every value filtered out as
    non-positive) must still yield the 9-row n=0/observed=0/
    deviation=expected frame — sum over zero rows is NULL without the
    coalesce (r6 ADVICE regression)."""
    from global_stock_data_warehouse_spark.operators.profile import benford_audit

    empty = spark.createDataFrame([], "v double")
    negatives = spark.createDataFrame([(-3.2,), (0.0,)], ["v"])
    for df in (empty, negatives):
        rows = {r.digit: r for r in benford_audit(df, "v").collect()}
        assert set(rows) == set(range(1, 10))
        for r in rows.values():
            assert r.n == 0 and r.observed == 0.0
            assert r.deviation == r.expected


def test_ks_drift_detects_shifted_distribution(spark):
    """A group drawn from a shifted distribution scores high D; a group
    identical to the pool scores low; D is in [0,1] and the argmax value
    is deterministic (smallest value attaining D)."""
    from global_stock_data_warehouse_spark.operators.profile import ks_drift

    rows = []
    # groups a & b: identical uniform 0..99 lengths; c: shifted +200
    for i in range(300):
        rows.append(("a", i % 100))
        rows.append(("b", i % 100))
        rows.append(("c", 200 + i % 100))
    df = spark.createDataFrame(rows, "source string, n_chars int")
    out = {r.source: r for r in ks_drift(df).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"].n_docs == 300
    # a and b see only the dilution from c: F_pool is 2/3 of F_a below 100
    assert abs(out["a"].ks_d - round(1 / 3, 6)) < 1e-9
    assert out["a"].ks_d == out["b"].ks_d
    # c is fully disjoint above the pool's lower mass: D = 2/3
    assert abs(out["c"].ks_d - round(2 / 3, 6)) < 1e-9
    # D=2/3 is attained over the whole gap [99, 199]; argmax reports the
    # SMALLEST attaining value
    assert out["c"].at_value == 99
    assert all(0.0 <= r.ks_d <= 1.0 for r in out.values())


def test_ks_drift_single_group_scores_zero(spark):
    """One group == the pool: D must be exactly 0; empty input -> empty."""
    from global_stock_data_warehouse_spark.operators.profile import ks_drift

    df = spark.createDataFrame(
        [("a", v) for v in (1, 2, 2, 5, 9)], "source string, n_chars int"
    )
    rows = ks_drift(df).collect()
    assert len(rows) == 1 and rows[0].ks_d == 0.0
    empty = spark.createDataFrame([], "source string, n_chars int")
    assert ks_drift(empty).count() == 0


def test_snapshot_diff_hashed_equals_exact(spark):
    """The hashed wide-table diff must equal the exact full-outer diff —
    including the adversarial NULL-SHIFT case ((NULL,'a') vs ('a',NULL)
    on adjacent columns) that a bare multi-arg xxhash64 would collide."""
    from global_stock_data_warehouse_spark.operators.cdc import (
        snapshot_diff,
        snapshot_diff_hashed,
    )

    old = spark.createDataFrame(
        [
            (1, None, "a", 1.0),   # null-shift pair with new
            (2, "b", "b", 2.0),    # unchanged
            (3, "c", None, 3.0),   # update (value change)
            (4, "d", "d", 4.0),    # delete
        ],
        "k long, x string, y string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", None, 1.0),   # MUST be an update, not unchanged
            (2, "b", "b", 2.0),
            (3, "c", "zz", 3.0),
            (5, "e", "e", 5.0),    # insert
        ],
        "k long, x string, y string, v double",
    )
    exact = sorted(map(tuple, snapshot_diff(old, new, ["k"]).collect()))
    hashed = sorted(map(tuple, snapshot_diff_hashed(old, new, ["k"]).collect()))
    assert hashed == exact
    assert any(r[0] == 1 and r[1] == "update" for r in exact)
    # shuffled-join fallback path (changed set over the broadcast cap)
    fallback = sorted(
        map(
            tuple,
            snapshot_diff_hashed(
                old, new, ["k"], broadcast_changed_max=0
            ).collect(),
        )
    )
    assert fallback == exact


def test_measured_bytes_scales_with_key_width(spark):
    """The broadcast dispatch is BYTE-sized, not row-counted: the same
    row count with a wide string key must measure ~100x bigger and fall
    off the forced-broadcast path at the same cap."""
    from global_stock_data_warehouse_spark.operators.cdc import _measured_bytes

    narrow = spark.range(1000).select(F.col("id").alias("k"))
    wide = narrow.select(
        F.concat(F.lit("x" * 500), F.col("k").cast("string")).alias("k")
    )
    nb, wb = _measured_bytes(narrow), _measured_bytes(wide)
    assert nb < 40_000  # ~24 B/row
    assert wb > 500_000  # string payload dominates
    assert _measured_bytes(narrow.limit(0)) == 0


def test_measured_bytes_composite_columns_not_undersized(spark):
    """ArrayType/StructType/MapType columns previously fell through to
    the 8-byte scalar default, so a 100-element array key measured like
    a bigint and wrongly stayed on the forced-broadcast path (ADVICE
    r8). Composite columns must measure at least their serialized JSON
    width — the safe over-estimate for a broadcast gate."""
    from global_stock_data_warehouse_spark.operators.cdc import _measured_bytes

    arr = spark.range(1000).select(
        F.array_repeat(F.col("id"), 100).alias("k")
    )
    ab = _measured_bytes(arr)
    # 100 bigints rendered as JSON: >> the old 8 B/row undercount
    assert ab > 1000 * 100  # >=1 byte per element is a loose floor
    struct = spark.range(1000).select(
        F.struct(
            F.col("id").alias("a"),
            F.concat(F.lit("y" * 64), F.col("id").cast("string")).alias("b"),
        ).alias("k")
    )
    sb = _measured_bytes(struct)
    assert sb > 1000 * 64  # the embedded string must be visible
    mp = spark.range(1000).select(
        F.create_map(
            F.lit("key"), F.concat(F.lit("z" * 64), F.col("id").cast("string"))
        ).alias("k")
    )
    assert _measured_bytes(mp) > 1000 * 64
    # NULL composite values must not break the sum
    some_null = spark.range(10).select(
        F.when(F.col("id") % 2 == 0, F.array_repeat(F.col("id"), 3)).alias("k")
    )
    assert _measured_bytes(some_null) > 0


def test_maintain_agg_null_group_delete_only_and_empty(spark):
    """Degenerate changesets must preserve maintain(agg(old), diff) ==
    agg(new): a NULL group key (groupBy keeps NULL as a real group; a
    plain equi-join stranded the stale base row on one side of the full
    outer and silently kept its old sums — found by this test),
    a delete-only changeset erasing a whole group, and the empty
    changeset identity."""
    from global_stock_data_warehouse_spark.operators.cdc import (
        maintain_agg,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, None, 30), (4, "b", 40)],
        "pk long, g string, v long",
    )
    base = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("v")
    )

    def check(new):
        got = sorted(
            map(tuple, maintain_agg(
                base, snapshot_diff(old, new, ["pk"]), ["g"], ["v"]
            ).collect()),
            key=repr,
        )
        exp = sorted(
            map(tuple, new.groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("v")
            ).collect()),
            key=repr,
        )
        assert got == exp, f"{got} != {exp}"

    # NULL group: update (pk2), delete (pk3), insert (pk5) all land there
    check(spark.createDataFrame(
        [(1, "a", 10), (2, None, 25), (4, "b", 40), (5, None, 50)],
        "pk long, g string, v long",
    ))
    # delete-only changeset: group "b" and one NULL-group row vanish
    check(old.filter(F.col("pk").isin(1, 2)))
    # empty changeset: exact identity with the base aggregate
    check(old)


def test_maintain_agg_moves_groups_and_drops_empty(spark):
    """maintain(agg(old), diff(old,new)) == agg(new) including a row
    that MOVES between groups and a group whose count reaches zero."""
    from pyspark.sql import functions as F

    from global_stock_data_warehouse_spark.operators.cdc import (
        maintain_agg,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, g string, v long"
    )
    new = spark.createDataFrame(
        # k=2 moves a->c, k=3 (whole group b) deleted, k=4 inserted in a
        [(1, "a", 10), (2, "c", 25), (4, "a", 5)], "k long, g string, v long"
    )

    def agg(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("v")
        )

    maintained = sorted(
        map(tuple, maintain_agg(agg(old), snapshot_diff(old, new, ["k"]),
                                ["g"], ["v"]).collect())
    )
    recomputed = sorted(map(tuple, agg(new).collect()))
    assert maintained == recomputed
    assert not any(r[0] == "b" for r in maintained), "empty group must drop"
    # empty changeset: identity
    same = sorted(
        map(tuple, maintain_agg(agg(old), snapshot_diff(old, old, ["k"]),
                                ["g"], ["v"]).collect())
    )
    assert same == sorted(map(tuple, agg(old).collect()))


def test_snapshot_diff_hashed_keys_only_membership(spark):
    """Zero compare columns = pure membership diff: only inserts and
    deletes, matched keys silent — identical to the exact diff."""
    from global_stock_data_warehouse_spark.operators.cdc import (
        snapshot_diff,
        snapshot_diff_hashed,
    )

    old = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    new = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    exact = sorted(map(tuple, snapshot_diff(old, new, ["k"], []).collect()))
    hashed = sorted(
        map(tuple, snapshot_diff_hashed(old, new, ["k"], []).collect())
    )
    assert hashed == exact == [(1, "delete"), (4, "insert")]
