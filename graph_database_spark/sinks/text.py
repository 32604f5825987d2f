"""Text-file result sinks (SURVEY.md §2.1 S5).

The reference appends result lines to ``output/<ego>.proofs`` /
``<ego>.metrics`` (src/main.js:32-46,56,69,80,99,115-119). Results are a
handful of lines per network, so the faithful sink is a driver-side
write of collected rows — ``write_proofs`` / ``write_metrics`` reproduce
the golden files byte-for-byte (including JS number formatting: integral
doubles print without a decimal point, NaN prints as ``NaN``).

For large results the distributed path is ``write_text_lines``:
``df.write.text`` with a single string column — no driver transfer.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, functions as F


def js_num(v) -> str:
    """Format a number the way JS string-concatenation does: shortest
    round-trip repr, integral values without '.0', NaN as 'NaN'."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    return str(v)


def write_proofs(path: str, denom: int, num: int) -> None:
    """Reproduce ``<ego>.proofs`` (src/main.js:31-46): header, denominator,
    numerator, percentage, verdict (NaN > 50 is false -> disproved)."""
    pct = (num / denom) * 100 if denom else float("nan")
    verdict = "proved" if pct > 50 else "disproved"
    lines = [
        "Proof 1 (czhao13-01): ",
        f"People having same hometown and same university: {js_num(denom)}",
        f"People having same hometown and same university and who are connected: {js_num(num)}",
        f"Percentage of the latter: {js_num(pct)}",
        f"Hypothesis 1 {verdict} for this ego network.",
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_metrics(path: str, node_count: int, edge_count: int, cc_rows) -> None:
    """Reproduce ``<ego>.metrics`` (src/main.js:56,69,80,99): header, node
    and edge counts, one clustering-coefficient line per friend.

    ``cc_rows``: iterable of (name, cc) — the caller decides order; the
    golden files are order-insensitive sets (reference appends from
    interleaved async callbacks, SURVEY.md §3.1)."""
    lines = [
        "Metrics: ",
        f"Node count: {js_num(node_count)}",
        f"Edge count: {js_num(edge_count)}",
    ]
    lines += [f"Clustering coefficient for {name}: {js_num(cc)}" for name, cc in cc_rows]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_text_lines(df: DataFrame, path: str, col: str | None = None) -> None:
    """Distributed text sink: write one column of ``df`` as plain lines.

    The scale path for big results — stays on executors, no collect."""
    out = df if col is None else df.select(F.col(col).cast("string").alias("value"))
    out.write.mode("overwrite").text(path)
