"""End-to-end market-sync orchestration: gate -> fetch -> quarantine ->
upsert -> summary, with re-run idempotency and the incremental skip."""

from __future__ import annotations

import pandas as pd

from global_stock_data_warehouse_spark.plans.orchestrate import sync_market


def test_sync_market_end_to_end(spark, tmp_path):
    path = str(tmp_path / "bars")

    def fake_fetch(sym: str) -> pd.DataFrame:
        if sym == "DEAD":
            raise RuntimeError("no such symbol")
        return pd.DataFrame(
            {
                "date": ["2024-01-02", "2024-01-03"],
                "open": [1.0, 2.0], "high": [2.0, 3.0],
                "low": [0.5, 1.5], "close": [1.5, 2.5],
                "volume": [100, 200],
            }
        )

    syms = spark.createDataFrame([("AAA",), ("BBB",), ("DEAD",)], "symbol string")
    r1 = sync_market(spark, syms, fake_fetch, path, as_of="2024-01-03", max_workers=2)
    assert r1["skipped"] is False and r1["has_changed"] is True
    assert r1["success"] == 2 and r1["total"] == 3
    assert r1["fail_list"] == ["DEAD"]
    assert r1["total_records"] == 4 and r1["latest_date"] == "2024-01-03"

    # second run, same as_of: watermark current -> whole fetch skipped
    r2 = sync_market(spark, syms, fake_fetch, path, as_of="2024-01-03", max_workers=2)
    assert r2["skipped"] is True and r2["total_records"] == 4

    # forced re-run (later as_of): upsert is idempotent, count unchanged
    r3 = sync_market(spark, syms, fake_fetch, path, as_of="2024-01-04", max_workers=2)
    assert r3["skipped"] is False and r3["total_records"] == 4
