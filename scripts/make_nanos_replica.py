"""Build an alternate-ts-vintage replica of a testdata sf dir.

The driver's events.parquet has shipped in two physical ts encodings
across rounds (TIMESTAMP(NANOS) in rounds 1-3, plain timestamp[us]
from round 4 — see tests/test_events_vintages.py), and nothing stops a
future regeneration from shipping a third. The local testdata is
us-only, so the local correctness gate could never see what an
alternate-vintage driver file does to a query (VERDICT r9/r10: the
km_survival red rows). This script manufactures the missing vintages:

  * every table except events is symlinked from the source dir;
  * events.parquet is rewritten per ``mode``:
      - ``ns``         (default) timestamp[ns] with a DETERMINISTIC
                       sub-microsecond jitter of
                       (event_id * 137 + 331) % 1000 ns per value;
      - ``ns-aligned`` timestamp[ns], values still us-aligned (the
                       encoding changes, the instants do not);
      - ``int96``      the deprecated INT96 physical encoding (what
                       old Spark/Impala writers produce), same jitter
                       as ``ns`` — Spark reads INT96 natively as
                       TIMESTAMP (no nanosAsLong fallback), DuckDB as
                       TIMESTAMP_NS, so this exercises a DIFFERENT
                       read path than the NANOS annotation.

The jitter never crosses a microsecond boundary (source values are
us-aligned, jitter < 1000 ns), so a vintage-proof query must produce
EXACTLY the same answer as on the us file — both Spark's load path and
DuckDB's reader truncate ns -> us. Any divergence flags an oracle or
query that is sensitive to the physical encoding.

Usage: python scripts/make_nanos_replica.py [src_sf_dir] [dest_dir] [mode]
Defaults: /root/testdata/sf0.01 -> /tmp/sf0.01_nanos, mode=ns
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MODES = ("ns", "ns-aligned", "int96")


def build_replica(from_dir: str, dest: str, mode: str = "ns") -> str:
    if mode not in MODES:
        raise SystemExit(f"unknown mode {mode!r}; expected one of {MODES}")
    os.makedirs(dest, exist_ok=True)
    for name in os.listdir(from_dir):
        if name.endswith(".parquet") and name != "events.parquet":
            link = os.path.join(dest, name)
            # Recreate unconditionally (ADVICE r11): a stale symlink
            # left from a previous sweep over a since-regenerated source
            # dir with the same basename would silently gate against
            # mixed-vintage data.
            if os.path.islink(link) or os.path.exists(link):
                os.remove(link)
            os.symlink(os.path.join(from_dir, name), link)

    t = pq.read_table(os.path.join(from_dir, "events.parquet"))
    ts_ns = pc.cast(t["ts"], pa.timestamp("ns"))
    if mode != "ns-aligned":
        eid = pc.cast(t["event_id"], pa.int64())
        raw = pc.add(
            pc.multiply(eid, pa.scalar(137, pa.int64())),
            pa.scalar(331, pa.int64()),
        )
        # a % 1000 == a - (a // 1000) * 1000 (values are non-negative)
        mod = pc.subtract(
            raw,
            pc.multiply(
                pc.divide(raw, pa.scalar(1000, pa.int64())),
                pa.scalar(1000, pa.int64()),
            ),
        )
        ts_ns = pc.add(ts_ns, pc.cast(mod, pa.duration("ns")))
    cols = {f.name: t[f.name] for f in t.schema}
    cols["ts"] = ts_ns
    out = pa.table(cols)
    path = os.path.join(dest, "events.parquet")
    if mode == "int96":
        pq.write_table(
            out, path, use_deprecated_int96_timestamps=True,
            coerce_timestamps=None,
        )
        stored = str(pq.ParquetFile(path).schema.column(
            [f.name for f in t.schema].index("ts")
        ).physical_type)
        assert stored == "INT96", stored
    else:
        # version>=2.6 is what lets parquet store TIMESTAMP(NANOS)
        # physically (older writer versions silently coerce to micros).
        pq.write_table(out, path, version="2.6", coerce_timestamps=None)
        stored = str(pq.read_schema(path).field("ts").type)
        assert stored == "timestamp[ns]", stored
    return stored


if __name__ == "__main__":
    from_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.01_nanos"
    mode = sys.argv[3] if len(sys.argv) > 3 else "ns"
    stored = build_replica(from_dir, dest, mode)
    print(f"wrote {mode} replica: {dest} (ts stored as {stored})")
