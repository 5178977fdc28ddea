"""One A/B rep of the doc_* family (VERDICT r4 task #2): time the five
queries whose round-4 driver bench regressed >=2x vs round 3 at fixed
input, importing __spark_entry__ from a given checkout so HEAD and the
round-3 tree run the same harness on the same host session,
interleaved by the caller.

Usage: python scripts/ab_docfamily.py <checkout_dir> <label> [sf_dir]
Prints one JSON line {"label": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

CHECKOUT = os.path.abspath(sys.argv[1])
LABEL = sys.argv[2]
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
QUERIES = [
    "doc_incremental_dedup", "doc_decontaminate", "doc_pack",
    "doc_dedup_neardup", "doc_dup_spans",
]

sys.path.insert(0, CHECKOUT)

import __spark_entry__ as E  # noqa: E402
from geospark.session import get_spark  # noqa: E402

spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                  extra_conf={"spark.ui.enabled": "false"})
qs = E.queries()
# one warmup query to absorb session/codegen start-up cost
qs[QUERIES[0]](spark, SF_DIR).count()

out = {}
for name in QUERIES:
    t0 = time.monotonic()
    qs[name](spark, SF_DIR).count()
    out[name] = round(time.monotonic() - t0, 3)
print(json.dumps({"label": LABEL, "queries": out}), flush=True)
spark.stop()
