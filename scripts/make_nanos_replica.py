"""Build a TIMESTAMP(NANOS)-vintage replica of a testdata sf dir.

The driver's events.parquet has shipped in two physical ts encodings
across rounds (TIMESTAMP(NANOS) in rounds 1-3, plain timestamp[us]
from round 4 — see tests/test_events_vintages.py). The local testdata
is us-only, so the local correctness gate could never see what a
nanos-vintage driver file does to a query (VERDICT r9: the km_survival
red row). This script manufactures that missing vintage:

  * every table except events is symlinked from the source dir;
  * events.parquet is rewritten as timestamp[ns] with a DETERMINISTIC
    sub-microsecond jitter of (event_id * 137 + 331) % 1000 ns added to
    each value. The jitter never crosses a microsecond boundary (the
    source values are us-aligned, jitter < 1000 ns), so a vintage-proof
    query must produce EXACTLY the same answer as on the us file —
    both Spark's load_table (ts div 1000) and DuckDB's parquet reader
    truncate ns -> us. Any divergence flags an oracle or query that is
    sensitive to the physical encoding.

Usage: python scripts/make_nanos_replica.py [src_sf_dir] [dest_dir]
Defaults: /root/testdata/sf0.01 -> /tmp/sf0.01_nanos
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.01_nanos"

os.makedirs(dest, exist_ok=True)
for name in os.listdir(from_dir):
    if name.endswith(".parquet") and name != "events.parquet":
        link = os.path.join(dest, name)
        if not os.path.exists(link):
            os.symlink(os.path.join(from_dir, name), link)

t = pq.read_table(os.path.join(from_dir, "events.parquet"))
ts_ns = pc.cast(t["ts"], pa.timestamp("ns"))
eid = pc.cast(t["event_id"], pa.int64())
raw = pc.add(pc.multiply(eid, pa.scalar(137, pa.int64())), pa.scalar(331, pa.int64()))
# a % 1000 == a - (a // 1000) * 1000 (values are non-negative)
mod = pc.subtract(
    raw,
    pc.multiply(
        pc.divide(raw, pa.scalar(1000, pa.int64())), pa.scalar(1000, pa.int64())
    ),
)
jitter = pc.cast(mod, pa.duration("ns"))
ts_ns = pc.add(ts_ns, jitter)
cols = {f.name: t[f.name] for f in t.schema}
cols["ts"] = ts_ns
out = pa.table(cols)
# version>=2.6 is what lets parquet store TIMESTAMP(NANOS) physically
# (older writer versions silently coerce to micros).
pq.write_table(
    out, os.path.join(dest, "events.parquet"), version="2.6",
    coerce_timestamps=None,
)
stored = pq.read_schema(os.path.join(dest, "events.parquet")).field("ts").type
assert str(stored) == "timestamp[ns]", stored
print(f"wrote nanos replica: {dest} (ts stored as {stored}, jittered)")
