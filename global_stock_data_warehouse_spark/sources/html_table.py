"""Distributed HTML-table scan with a stdlib-only parser (S1/S4).

The reference extracts symbol universes from fetched HTML on the driver
(`downloader_kr.py:37` / `downloader_tw.py:55` — ``pd.read_html`` over the
response body). Here the extraction is a distributed scan: ``binaryFile``
ships each landed page to an executor, and a stdlib ``html.parser`` state
machine pulls every <table> out as a grid — no lxml/bs4 dependency.

Semantics (documented deltas from pandas.read_html): every <table> —
including nested ones — is emitted as its OWN table (nested cell text is
not duplicated into the parent cell); colspan/rowspan are not expanded
(cells keep source order). Both are the right call for machine-generated
exchange listings, which are flat grids.

Output is schema-stable: ``(path, table_idx, row_idx, cells)``; header
detection runs downstream (`landing.detect_header_rows`).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

SCAN_HTML_SCHEMA = "path string, table_idx bigint, row_idx bigint, cells array<string>"


class _TableExtractor(HTMLParser):
    """Collects every <table> as rows of cell text; innermost-open-cell
    wins for text so nested tables don't leak into parents."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self._stack: list[dict] = []  # one frame per open <table>

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._stack.append({"rows": [], "row": None, "cell": None})
        elif self._stack:
            top = self._stack[-1]
            if tag == "tr":
                self._flush_row(top)
                top["row"] = []
            elif tag in ("td", "th"):
                if top["row"] is None:
                    top["row"] = []
                self._flush_cell(top)
                top["cell"] = []

    def handle_endtag(self, tag: str) -> None:
        if not self._stack:
            return
        top = self._stack[-1]
        if tag in ("td", "th"):
            self._flush_cell(top)
        elif tag == "tr":
            self._flush_row(top)
        elif tag == "table":
            self._flush_row(top)
            self.tables.append(top["rows"])
            self._stack.pop()

    def handle_data(self, data: str) -> None:
        if self._stack and self._stack[-1]["cell"] is not None:
            self._stack[-1]["cell"].append(data)

    @staticmethod
    def _flush_cell(top: dict) -> None:
        if top["cell"] is not None:
            top["row"].append("".join(top["cell"]).strip())
            top["cell"] = None

    @staticmethod
    def _flush_row(top: dict) -> None:
        _TableExtractor._flush_cell(top)
        if top["row"] is not None:
            top["rows"].append(top["row"])
            top["row"] = None


def parse_html_tables(text: str) -> list[list[list[str]]]:
    """All <table> grids in one document, document order."""
    p = _TableExtractor()
    p.feed(text)
    p.close()
    return p.tables


def scan_html_table(
    spark: SparkSession, path: str, encoding: str = "utf-8"
) -> DataFrame:
    """Distributed HTML-table scan over landed pages (one file per task)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                tables = parse_html_tables(bytes(content).decode(encoding, "replace"))
                for ti, rows in enumerate(tables):
                    for ri, cells in enumerate(rows):
                        out.append((p, ti, ri, cells))
            yield pd.DataFrame(
                out, columns=["path", "table_idx", "row_idx", "cells"]
            )

    return files.mapInPandas(decode, SCAN_HTML_SCHEMA)
