"""Geo-entity extraction over the pages table.

``pages(url, warc_ts, html, text, lang)`` -> ``points(url, point_id,
lat, lng)`` via an Arrow-batched ``mapInArrow`` stage: no per-row
Python (input_hint mandate), no shuffle — extraction is a narrow map
over whatever partitioning the pages scan produced, so at 10^12 docs
it parallelizes with the input splits and Catalyst prunes ``html``
out of the scan entirely (we only read ``url`` and ``text``).

The per-url invariant (BASELINE.json input_hint): ``text`` must be
byte-identical to the reference extractor's output for the same url —
enforced by `tests/test_pages.py` comparing against
`geospark.pages.extract_text_from_html`.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

POINTS_SCHEMA = "url string, point_id long, lat double, lng double"

# fixed mention format written by the synthesizer / reference extractor
_COORD_RE = re.compile(r"coord: (-?\d+\.\d{6}), (-?\d+\.\d{6})")


def extract_points(pages: DataFrame) -> DataFrame:
    """points(url, point_id, lat, lng); point_id is the 0-based mention
    index within the page (deterministic given the text bytes)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = pa.Table.from_batches([b])
            urls = tbl.column("url").to_pylist()
            texts = tbl.column("text").to_pylist()
            # batch-vectorized matching: one regex pass over the
            # concatenated batch (rows separated by \x00, which never
            # occurs in text), match offsets mapped back to row ids via
            # searchsorted — the python-level loop runs per MATCH
            # (~1.5/page), not per row.
            safe = [t if t is not None else "" for t in texts]
            blob = "\x00".join(safe)
            offsets = np.zeros(len(safe) + 1, dtype=np.int64)
            np.cumsum([len(t) + 1 for t in safe], out=offsets[1:])
            starts: list[int] = []
            lats: list[float] = []
            lngs: list[float] = []
            for m in _COORD_RE.finditer(blob):
                starts.append(m.start())
                lats.append(float(m.group(1)))
                lngs.append(float(m.group(2)))
            row_idx = np.searchsorted(offsets, np.asarray(starts, np.int64),
                                      side="right") - 1
            # point_id = 0-based mention index within each row (matches
            # are emitted in document order)
            out_url = [urls[i] for i in row_idx]
            pid = np.zeros(len(row_idx), dtype=np.int64)
            if len(row_idx):
                new_row = np.ones(len(row_idx), dtype=bool)
                new_row[1:] = row_idx[1:] != row_idx[:-1]
                run_starts = np.flatnonzero(new_row)
                seq = np.arange(len(row_idx), dtype=np.int64)
                pid = seq - np.repeat(seq[run_starts], np.diff(
                    np.append(run_starts, len(row_idx))))
            yield pa.record_batch(
                [
                    pa.array(out_url, pa.string()),
                    pa.array(pid, pa.int64()),
                    pa.array(np.asarray(lats, np.float64), pa.float64()),
                    pa.array(np.asarray(lngs, np.float64), pa.float64()),
                ],
                names=["url", "point_id", "lat", "lng"],
            )

    return pages.select("url", "text").mapInArrow(run, POINTS_SCHEMA)
