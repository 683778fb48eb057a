"""Custom stateful streaming operator: continuity-gap detection.

The reference's 14-day gap kill-switch (downloader_wmy.py:101-107) is a
batch full-rescan: every run re-sorts each symbol's entire history to find
day gaps. Streamed, that becomes O(1)-state-per-key: remember only the last
seen date per symbol (``applyInPandasWithState``), emit a gap row whenever a
new bar arrives more than ``max_gap_days`` after it. State size = one date
per live key — bounded regardless of history length, the property that
makes it viable over an unbounded 100 TB stream (the batch rescan is not).

State-store partitioning keys on the symbol, matching the batch pipeline's
shuffle key, so a hybrid batch-backfill + streaming-tail deployment
co-partitions.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def detect_gaps_stateful(
    stream: DataFrame,
    key_col: str = "symbol",
    date_col: str = "d",
    max_gap_days: int = 14,
) -> DataFrame:
    """Emit (key, gap_start, gap_end, gap_days) for every consecutive-bar
    gap exceeding ``max_gap_days``, across micro-batch boundaries."""
    out_schema = f"{key_col} string, gap_start date, gap_end date, gap_days int"
    state_schema = "last_date date"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev: dt.date | None = state.get[0] if state.exists else None
        gaps: list[tuple] = []
        dates: list[dt.date] = []
        for pdf in pdfs:
            col = pd.to_datetime(pdf[date_col])
            dates.extend(d.date() for d in col)
        # the stored watermark only moves FORWARD: a late micro-batch whose
        # dates all precede last_date must not regress state (that would
        # re-emit or fabricate gaps on the next batch); dates at or before
        # the watermark are ignored rather than diffed backwards
        for d in sorted(set(dates)):
            if prev is not None:
                if d <= prev:
                    continue
                gd = (d - prev).days
                if gd > max_gap_days:
                    gaps.append((key[0], prev, d, gd))
            prev = d
        if prev is not None:
            state.update((prev,))
        if gaps:
            yield pd.DataFrame(gaps, columns=[key_col, "gap_start", "gap_end", "gap_days"])

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
