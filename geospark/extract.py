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
            out_url: list[str] = []
            out_pid: list[int] = []
            out_lat: list[float] = []
            out_lng: list[float] = []
            for url, text in zip(urls, texts):
                if text is None:
                    continue
                for i, m in enumerate(_COORD_RE.finditer(text)):
                    out_url.append(url)
                    out_pid.append(i)
                    out_lat.append(float(m.group(1)))
                    out_lng.append(float(m.group(2)))
            yield pa.record_batch(
                [
                    pa.array(out_url, pa.string()),
                    pa.array(np.asarray(out_pid, np.int64), pa.int64()),
                    pa.array(np.asarray(out_lat, np.float64), pa.float64()),
                    pa.array(np.asarray(out_lng, np.float64), pa.float64()),
                ],
                names=["url", "point_id", "lat", "lng"],
            )

    return pages.select("url", "text").mapInArrow(run, POINTS_SCHEMA)
