"""Distributed xlsx scan with a stdlib-only codec (S3 `scan_excel`).

The reference parses vendor Excel payloads on the driver thread
(`downloader_hk.py:68` — ``pd.read_excel(io.BytesIO(r.content),
header=None)`` on a fetched HKEX sheet). This module makes that a real
distributed scan with NO external codec: xlsx is a zip of XML parts, so
``zipfile`` + ``xml.etree`` (both stdlib) decode it — one file per task via
Spark's ``binaryFile`` source and an Arrow-batched ``mapInPandas`` kernel.

Output is schema-stable regardless of sheet shape —
``(path, row_idx, cells array<string>)`` — so downstream header detection
(`landing.detect_header_rows` / `grid_to_records`, the
`downloader_hk.py:70-90` semantics) runs on the grid, not inside the scan.

Scale: one task per file (vendor sheets are many-small, never one-huge);
``binaryFile`` streams bytes executor-side so the driver never touches
payloads; the parse is O(cells) with the shared-string table materialized
once per file.
"""

from __future__ import annotations

import re
import zipfile
from collections.abc import Iterator
from io import BytesIO
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession

SCAN_EXCEL_SCHEMA = "path string, row_idx bigint, cells array<string>"

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 (base-26 bijective column letters)."""
    ix = 0
    for ch in ref:
        ix = ix * 26 + (ord(ch) - ord("A") + 1)
    return ix - 1


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text_of(el: ElementTree.Element) -> str:
    """Concatenate all <t> descendants (rich-text runs split one string
    across multiple <r><t> nodes)."""
    return "".join(t.text or "" for t in el.iter() if _local(t.tag) == "t")


def parse_xlsx_grid(data: bytes, sheet_index: int = 0) -> list[list[str | None]]:
    """Decode one xlsx payload to a row-major grid of cell strings.

    Handles shared strings (``t="s"``), inline strings (``t="inlineStr"``),
    formula-cached strings (``t="str"``), booleans (``t="b"`` -> TRUE/FALSE)
    and numbers (the default); absent cells become None so downstream
    header detection sees true sheet geometry. Raises on a missing sheet —
    a silent empty parse would corrupt every downstream row.
    """
    zf = zipfile.ZipFile(BytesIO(data))

    def _sheet_order(name: str) -> tuple[int, int, str]:
        # numeric suffix, not lexicographic: sheet10.xml must sort AFTER
        # sheet2.xml or sheet_index picks the wrong sheet on 10+-sheet books
        m = re.search(r"sheet(\d+)\.xml$", name)
        return (0, int(m.group(1)), name) if m else (1, 0, name)

    sheets = sorted(
        (
            n
            for n in zf.namelist()
            if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
        ),
        key=_sheet_order,
    )
    if sheet_index >= len(sheets):
        raise ValueError(f"xlsx has {len(sheets)} sheet(s), wanted index {sheet_index}")

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [_text_of(si) for si in root if _local(si.tag) == "si"]

    grid: list[list[str | None]] = []
    root = ElementTree.fromstring(zf.read(sheets[sheet_index]))
    for row in root.iter():
        if _local(row.tag) != "row":
            continue
        cells: list[str | None] = []
        for c in row:
            if _local(c.tag) != "c":
                continue
            ref = c.attrib.get("r", "")
            m = _CELL_REF.match(ref)
            # pad skipped (empty) columns so indices stay honest
            if m:
                ci = _col_index(m.group(1))
                while len(cells) < ci:
                    cells.append(None)
            ctype = c.attrib.get("t", "n")
            value: str | None = None
            if ctype == "inlineStr":
                value = _text_of(c)
            else:
                v = next((ch for ch in c if _local(ch.tag) == "v"), None)
                if v is not None and v.text is not None:
                    if ctype == "s":
                        value = shared[int(v.text)]
                    elif ctype == "b":
                        value = "TRUE" if v.text.strip() == "1" else "FALSE"
                    else:  # "n", "str", "e"
                        value = v.text
            cells.append(value)
        grid.append(cells)
    return grid


def scan_excel(
    spark: SparkSession, path: str, sheet_index: int = 0
) -> DataFrame:
    """Distributed xlsx scan: every matching file decoded executor-side.

    Returns ``(path, row_idx, cells)`` — feed a collected per-file grid to
    ``landing.grid_to_records`` for header detection + column naming
    (the `downloader_hk.py:70-90` normalization step).
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, row in enumerate(parse_xlsx_grid(bytes(content), sheet_index)):
                    out.append((p, i, [None if c is None else str(c) for c in row]))
            yield pd.DataFrame(out, columns=["path", "row_idx", "cells"])

    return files.mapInPandas(decode, SCAN_EXCEL_SCHEMA)
