"""Calendar-bucket expressions matching pandas resample labels.

The reference resamples daily bars with pandas ``resample('W-FRI')``,
``'M'``, ``'Y'`` (downloader_wmy.py:44-51): bucket label = period END date,
empty buckets dropped. Dropping empty buckets is automatic here because we
bucket by expression + groupBy — only observed dates produce groups.

All three are plain Column expressions (no UDF): codegen'd, and usable as
partition keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def week_ending_friday(col: Column | str) -> Column:
    """The Friday on-or-after ``col`` — pandas ``resample('W-FRI')`` label.

    ``next_day(d, 'Fri')`` returns the first Friday strictly AFTER d, so a
    Friday would land in next week's bucket; anchoring at d-1 makes Friday
    map to itself.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.next_day(F.date_sub(F.to_date(c), 1), "Fri")


def month_end(col: Column | str) -> Column:
    """Last calendar day of ``col``'s month — pandas ``resample('M')`` label."""
    c = F.col(col) if isinstance(col, str) else col
    return F.last_day(F.to_date(c))


def year_end(col: Column | str) -> Column:
    """Dec 31 of ``col``'s year — pandas ``resample('Y')`` label."""
    c = F.col(col) if isinstance(col, str) else col
    return F.last_day(F.add_months(F.trunc(F.to_date(c), "year"), 11))


BUCKETERS = {
    "W": week_ending_friday,
    "M": month_end,
    "Y": year_end,
}
