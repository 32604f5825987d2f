"""Streaming Count-Min sketch: bounded-state frequency tracking.

Frequency-over-a-stream is the canonical sketch use case: exact per-item
counts need unbounded state, while a CMS is a FIXED depth*width counter
table whose micro-batch deltas merge by cell-wise addition (the
mergeability the batch operator pins in tests). Each ``foreachBatch``
call builds the batch's sketch with the SAME md5 cell family as
``operators/sketches.cms_build`` — so a sketch merged over any batch
split equals the batch-built sketch over the union — and folds it into
a persisted cell table.

The persisted state is at most ``depth * width`` cells, so the merge is
a driver-side dictionary update by design (this is the entire point of
a sketch — the state that fits anywhere). Durability rides the
versioned-snapshot sink (sinks/versioned.py): every merged state is a
new ``v=N`` directory published by an atomic manifest replace, so a
crash mid-write leaves an unreferenced directory — never a torn or
silently-reset sketch (the earlier read-overwrite-same-path scheme
could lose the whole accumulated state to one mid-write crash). Replays
are idempotent: the cells carry the last merged ``batch_id`` and a
replayed batch (the at-least-once recovery contract) is skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph_database_spark.operators.sketches import cms_build
from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

_SCHEMA = "row int, col long, cnt long, last_batch long"


def read_cms(spark, path: str) -> dict[tuple[int, int], int]:
    """Latest committed sketch as a {(row, col): count} dict (empty if
    nothing has been committed yet)."""
    if not list_versions(path):
        return {}
    return {
        (r["row"], r["col"]): r["cnt"]
        for r in read_version(spark, path).collect()
    }


def merge_batch_into_cms(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    item_col: str,
    depth: int = 3,
    width: int = 1024,
) -> None:
    """Fold one micro-batch into the persisted sketch at ``path``
    (cell-wise add; skip if ``batch_id`` was already merged)."""
    spark = batch_df.sparkSession
    cells: dict[tuple[int, int], int] = {}
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            cells[(r["row"], r["col"])] = r["cnt"]
            last = max(last, r["last_batch"])
    if batch_id <= last:
        return  # replayed batch — already merged, idempotent skip
    for r in cms_build(batch_df, item_col, depth, width).collect():
        key = (r["row"], r["col"])
        cells[key] = cells.get(key, 0) + r["cnt"]
    out = [(row, col, cnt, batch_id) for (row, col), cnt in cells.items()]
    write_version(
        spark.createDataFrame(out, _SCHEMA).coalesce(1),
        path,
        note=f"cms batch {batch_id}",
    )


def cms_stream(
    stream: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    depth: int = 3,
    width: int = 1024,
):
    """Start the sketch-merging sink; returns the StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_cms(batch_df, batch_id, path, item_col, depth, width)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )


_HH_SCHEMA = "kind string, row int, col long, cnt long, item string, last_batch long"


def _py_cms_cell(j: int, item: str, width: int) -> int:
    """Driver-side twin of operators/sketches.md5_hash60 % width — the
    same seed-prefixed md5 family, so candidates rescored here address
    exactly the cells the Spark-built registers populated."""
    import hashlib

    h = hashlib.md5(f"{j}|{item}".encode()).hexdigest()[:15]
    return int(h, 16) % width


def read_cms_hh_state(spark, path: str):
    """Latest committed heavy-hitters state as
    ``(cells dict, candidate set, total, last_batch)``."""
    cells: dict[tuple[int, int], int] = {}
    cand: set[str] = set()
    total = 0
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            if r["kind"] == "cell":
                cells[(r["row"], r["col"])] = r["cnt"]
            elif r["kind"] == "cand":
                cand.add(r["item"])
            else:  # kind == "total"
                total = r["cnt"]
            last = max(last, r["last_batch"])
    return cells, cand, total, last


def merge_batch_into_cms_hh(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    item_col: str,
    depth: int = 3,
    width: int = 1024,
    n_candidates: int = 64,
) -> None:
    """Fold one micro-batch into the heavy-hitters state at ``path``:
    registers add cell-wise (split-invariant, like the plain CMS sink);
    the candidate set is the classic CMS+candidates maintenance — union
    the standing candidates with the batch's top-``n_candidates``, then
    RESCORE the union against the merged registers and keep the
    ``n_candidates`` best by (est DESC, item). State stays bounded at
    depth*width cells + n_candidates identities + one total; rescoring
    <= 2*n_candidates strings is the driver-side-dictionary pattern
    this module already uses. Replayed batches are skipped."""
    from pyspark.sql import functions as F

    from graph_database_spark.operators.sketches import cms_top_candidates

    spark = batch_df.sparkSession
    cells, cand, total, last = read_cms_hh_state(spark, path)
    if batch_id <= last:
        return  # replayed batch — already folded, idempotent skip
    for r in cms_build(batch_df, item_col, depth, width).collect():
        key = (r["row"], r["col"])
        cells[key] = cells.get(key, 0) + r["cnt"]
    total += batch_df.count()
    batch_top = {
        r["item"]
        for r in cms_top_candidates(
            batch_df.select(F.col(item_col).cast("string").alias(item_col)),
            item_col,
            n_candidates,
        ).collect()
    }

    def est(item: str) -> int:
        return min(
            cells.get((j, _py_cms_cell(j, item, width)), 0) for j in range(depth)
        )

    kept = sorted(cand | batch_top, key=lambda it: (-est(it), it))[:n_candidates]
    out = [("cell", row, col, cnt, None, batch_id) for (row, col), cnt in cells.items()]
    out += [("cand", None, None, None, it, batch_id) for it in kept]
    out.append(("total", None, None, total, None, batch_id))
    write_version(
        spark.createDataFrame(out, _HH_SCHEMA).coalesce(1),
        path,
        note=f"cms-hh batch {batch_id}",
    )


def read_heavy_hitters(
    spark,
    path: str,
    phi_denom: int = 1000,
    k: int | None = None,
    depth: int = 3,
    width: int = 1024,
) -> list[tuple[str, int]]:
    """``[(item, est), ...]`` — the heavy-hitters answer from persisted
    sketch state ONLY (no corpus access), mirroring
    operators/sketches.cms_heavy_hitters: candidates scored by the
    min-over-rows register read, kept when ``est * phi_denom >=
    total``, ordered (est DESC, item)."""
    cells, cand, total, _ = read_cms_hh_state(spark, path)

    def est(item: str) -> int:
        return min(
            cells.get((j, _py_cms_cell(j, item, width)), 0) for j in range(depth)
        )

    scored = [(it, est(it)) for it in cand]
    kept = [(it, e) for it, e in scored if e * phi_denom >= total]
    kept.sort(key=lambda t: (-t[1], t[0]))
    return kept[:k] if k is not None else kept


def cms_hh_stream(
    stream: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    depth: int = 3,
    width: int = 1024,
    n_candidates: int = 64,
):
    """Start the heavy-hitters state sink; returns the StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_cms_hh(
            batch_df, batch_id, path, item_col, depth, width, n_candidates
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )


_HLL_SCHEMA = "day timestamp, b long, reg int, last_batch long"


def read_hll_sliding(spark, path: str, days: int = 7, m: int = 32):
    """Windowed distinct-count summary over the persisted register
    state — IDENTICAL to the batch ``hll_sliding`` run over the union
    of all merged batches (pinned by tests/test_streaming_sketch.py),
    because register-wise max is split-invariant."""
    from pyspark.sql import functions as F

    from graph_database_spark.operators.sketches import (
        hll_sliding_from_daily,
    )

    daily = read_version(spark, path).select(
        "day", F.col("b").alias("_b"), F.col("reg").alias("_reg")
    )
    return hll_sliding_from_daily(daily, days=days, m=m)


def merge_batch_into_hll(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    key: str,
    ts_col: str = "ts",
    m: int = 32,
) -> None:
    """Fold one micro-batch's daily HLL registers into the persisted
    state at ``path`` (register-wise max; skip replayed batches — max
    is idempotent anyway, the skip just avoids a redundant version).

    State is at most days x m rows — the sketch-fits-anywhere argument
    of the CMS sink applies verbatim, as does its atomic-versioned
    durability story."""
    from graph_database_spark.operators.sketches import hll_daily_registers

    spark = batch_df.sparkSession
    state: dict[tuple, int] = {}
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            state[(r["day"], r["b"])] = r["reg"]
            last = max(last, r["last_batch"])
    if batch_id <= last:
        return
    for r in hll_daily_registers(batch_df, key, ts_col, m).collect():
        k = (r["day"], r["_b"])
        state[k] = max(state.get(k, 0), r["_reg"])
    out = [(day, b, reg, batch_id) for (day, b), reg in state.items()]
    write_version(
        spark.createDataFrame(out, _HLL_SCHEMA).coalesce(1),
        path,
        note=f"hll batch {batch_id}",
    )


def hll_stream(
    stream: DataFrame,
    key: str,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    m: int = 32,
):
    """Start the sliding-HLL register-merging sink; returns the
    StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_hll(batch_df, batch_id, path, key, ts_col, m)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )
