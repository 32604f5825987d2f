"""Table-layout planning operators: Z-order clustering and range
partitioning — the two knobs that decide whether a 100 TB scan prunes.

Z-ordering (Morton codes) interleaves the bits of two filter dimensions
so that rows close in BOTH dimensions land in the same file; per-file
min/max footers then prune scans that filter on either dimension. The
reference engine has no layout story (src/main.js loads everything);
this is the Spark-native answer a petabyte table needs.

Relationship to ``sinks/zorder.py``: the sink is the WRITE path (HOF
interleave over runtime-normalized dims + range-shuffled files); this
module is the oracle-verifiable ANALYTIC path — a fixed deterministic
bit formula over caller-banded dims, so DuckDB can replay it bit for
bit, plus the per-bucket footer-stats report that proves the pruning
property the sink's test measures on real files.

``range_partition_plan`` computes the exact balanced boundary values a
``repartitionByRange``/sort-based writer would use: N buckets of
near-equal row counts with explicit (value, tiebreak) upper bounds.
Built on :func:`rank.global_rank`, so no single-partition window ever
sees the full frame.

Engine-portability: all bit interleaving is integer div/mod/shift with
bit positions <= 20 (CLAUDE.md: left shifts stay under bit 31), and the
Spark and DuckDB expression strings are generated from the same Python
loop, operand for operand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.rank import global_prefix_sum, global_rank

# Bits per dimension: 10 + 10 interleave to a 20-bit Morton code.
Z_BITS = 10


def morton_expr_spark(x: str, y: str, bits: int = Z_BITS) -> str:
    """Spark SQL expression interleaving ``x`` (even bit lanes) and
    ``y`` (odd bit lanes) into a Morton / Z-value. Pure integer
    div/mod/shiftleft — one generated expression string, one parse
    (CLAUDE.md: never build big trees from nested F.* calls)."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(({x} div {1 << i}) % 2, {2 * i})")
        terms.append(f"shiftleft(({y} div {1 << i}) % 2, {2 * i + 1})")
    return " + ".join(terms)


def morton_expr_duckdb(x: str, y: str, bits: int = Z_BITS) -> str:
    """The DuckDB mirror of :func:`morton_expr_spark`, operand for
    operand (// for div, << for shiftleft) — integer arithmetic, so the
    two engines agree exactly."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} // {1 << i}) % 2) << {2 * i})")
        terms.append(f"((({y} // {1 << i}) % 2) << {2 * i + 1})")
    return " + ".join(terms)


def hilbert_expr_spark(x: str, y: str, bits: int = Z_BITS) -> str:
    """Spark SQL expression mapping ``(x, y)`` in [0, 2^bits)^2 to the
    Hilbert-curve distance d in [0, 4^bits) — the layout key behind
    modern lakehouse clustering (Hilbert preserves locality strictly
    better than Morton: every curve step is Manhattan-adjacent, so
    per-file min/max spans are tighter on BOTH dimensions).

    The classic per-bit loop (quadrant digit + rotate/reflect, the
    public xy2d algorithm) is inherently sequential in the bit index,
    so it runs as ONE ``aggregate`` HOF fold over the bit levels with
    (x, y, d) integer state — per-row JVM arithmetic, no UDF, no
    exponential expression blowup from textual substitution. The
    quadrant digit (3*rx) XOR ry is written arithmetically as
    3*rx + ry*(1-2*rx) because DuckDB's ``^`` is exponentiation — both
    engines then run identical integer ops.
    """
    n1 = (1 << bits) - 1
    s_list = ", ".join(str(1 << i) for i in range(bits - 1, -1, -1))
    rx = "(st.x div s) % 2"
    ry = "(st.y div s) % 2"
    return f"""aggregate(array({s_list}),
      named_struct('x', CAST({x} AS BIGINT), 'y', CAST({y} AS BIGINT),
                   'd', CAST(0 AS BIGINT)),
      (st, s) -> named_struct(
        'x', CASE WHEN {ry} = 1 THEN st.x
                  WHEN {rx} = 1 THEN {n1} - st.y
                  ELSE st.y END,
        'y', CASE WHEN {ry} = 1 THEN st.y
                  WHEN {rx} = 1 THEN {n1} - st.x
                  ELSE st.x END,
        'd', st.d + s * s * (3 * ({rx}) + ({ry}) * (1 - 2 * ({rx})))),
      st -> st.d)"""


def hilbert_ctes_duckdb(
    src_cte: str, bits: int = Z_BITS
) -> tuple[str, str]:
    """DuckDB mirror of :func:`hilbert_expr_spark` as a chain of one
    CTE per bit level (linear text growth; textual substitution of the
    state update would blow up exponentially). ``src_cte`` must expose
    columns (x, y) plus any carry-through columns listed by the caller
    in its final select — each step rewrites x, y and accumulates d.

    Returns (ctes_sql, final_cte_name); step arithmetic is generated
    from the same constants as the Spark fold, operand for operand
    (// for div, same CASE structure).
    """
    n1 = (1 << bits) - 1
    parts = []
    prev = src_cte
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        cur = f"h{i}"
        rx = f"((x // {s}) % 2)"
        ry = f"((y // {s}) % 2)"
        parts.append(
            f"""{cur} AS (
  SELECT * REPLACE (
    CASE WHEN {ry} = 1 THEN x
         WHEN {rx} = 1 THEN {n1} - y
         ELSE y END AS x,
    CASE WHEN {ry} = 1 THEN y
         WHEN {rx} = 1 THEN {n1} - x
         ELSE x END AS y,
    d + {s * s} * (3 * {rx} + {ry} * (1 - 2 * {rx})) AS d)
  FROM {prev}
)"""
        )
        prev = cur
    return ",\n".join(parts), prev


def hilbert_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = Z_BITS,
    bucket_shift: int = 10,
) -> DataFrame:
    """Per-Hilbert-bucket clustering stats — :func:`zorder_stats` with
    the Hilbert distance as the layout key, reporting the same footer
    metadata (count, per-dimension min/max/span) a scan planner prunes
    on. Comparing x_span/y_span against the Z-order buckets on the same
    dims is the locality-improvement evidence."""
    h = df.withColumn(
        "hval",
        F.expr(hilbert_expr_spark(x_col, y_col, bits)).cast("long"),
    )
    return (
        h.groupBy(
            (F.col("hval") / (1 << bucket_shift)).cast("long").alias("h_bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).cast("long").alias("x_min"),
            F.max(x_col).cast("long").alias("x_max"),
            F.min(y_col).cast("long").alias("y_min"),
            F.max(y_col).cast("long").alias("y_max"),
            F.sum("hval").cast("long").alias("h_sum"),
        )
        .select(
            "h_bucket",
            "n_rows",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
            (F.col("x_max") - F.col("x_min")).alias("x_span"),
            (F.col("y_max") - F.col("y_min")).alias("y_span"),
            "h_sum",
        )
    )


def zorder_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = Z_BITS,
    bucket_shift: int = 10,
) -> DataFrame:
    """Per-Z-bucket clustering stats: row count and min/max of each
    dimension — exactly the parquet footer metadata a scan planner
    prunes on. Tight per-bucket spans are the *point* of Z-ordering;
    this frame is the evidence.

    ``df`` must already expose integer dimension columns ``x_col`` /
    ``y_col`` in [0, 2^bits). One shuffle (the groupBy); the Morton code
    itself is embarrassingly parallel JVM integer math, no UDF.
    """
    z = df.withColumn(
        "zval", F.expr(morton_expr_spark(x_col, y_col, bits)).cast("long")
    )
    return (
        z.groupBy((F.col("zval") / (1 << bucket_shift)).cast("long").alias("z_bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).cast("long").alias("x_min"),
            F.max(x_col).cast("long").alias("x_max"),
            F.min(y_col).cast("long").alias("y_min"),
            F.max(y_col).cast("long").alias("y_max"),
            F.sum("zval").cast("long").alias("z_sum"),
        )
        .select(
            "z_bucket",
            "n_rows",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
            (F.col("x_max") - F.col("x_min")).alias("x_span"),
            (F.col("y_max") - F.col("y_min")).alias("y_span"),
            "z_sum",
        )
    )


# First-fit index into the bin-load array (1-based; size+1 = open new
# bin), as a SCALAR fold — integer state only, no array built, one
# O(bins) pass. The first shipped version computed this via
# filter(transform(...)) referenced from INSIDE the bins-update lambda:
# the exact expensive-expression-in-HOF trap CLAUDE.md documents, and
# it made each fold step O(bins^2) (measured: 2000 files = 36.5 s,
# 10000 files = timeout). The caller binds this value ONCE per step as
# a lambda variable via a transform over a single-element array — the
# SQL-HOF let-binding idiom.
_FFD_TGT = (
    "aggregate(acc.bins,"
    " named_struct('i', CAST(0 AS BIGINT), 'hit', CAST(0 AS BIGINT)),"
    " (st, b) -> named_struct('i', st.i + 1,"
    " 'hit', CASE WHEN st.hit > 0 THEN st.hit"
    " WHEN b + f.s <= acc.cap THEN st.i + 1"
    " ELSE CAST(0 AS BIGINT) END),"
    " st -> CASE WHEN st.hit > 0 THEN st.hit ELSE st.i + 1 END)"
)


def compaction_plan(
    files: DataFrame, fid_col: str, size_col: str, cap_mult: int = 2
) -> DataFrame:
    """First-fit-decreasing bin packing of small files into compaction
    targets of capacity ``cap_mult * max(size)`` — the planner step of
    every OPTIMIZE/compaction job (the small-files problem at 100 TB is
    metadata-scale: one row per file, not per data row).

    FFD is inherently sequential, so the whole plan is ONE JVM
    ``aggregate`` HOF fold over the size-desc-sorted file array (the
    ucb_replay pattern): state = (capacity, bin loads, assignments), no
    driver loop, no Python. Returns (file_id, size_bytes, bin) with
    1-based bin ids in open order.
    """
    one = files.agg(
        F.expr(
            f"sort_array(collect_list(named_struct("
            f"'negs', -CAST({size_col} AS BIGINT),"
            f" 'fid', CAST({fid_col} AS BIGINT),"
            f" 's', CAST({size_col} AS BIGINT))))"
        ).alias("fs")
    )
    # The fold carries assignments as a bare bigint array (asg[k] = bin
    # of fs[k]) and zips file ids back AFTER the fold: growing an
    # array<bigint> per step is a flat copy, where growing an
    # array<struct> was the measured O(n^2) struct-copy hot spot
    # (SCALE.md r9: 2000 files 36.5 s -> see re-measure).
    folded = one.select(
        "fs",
        F.expr(
            f"""
            aggregate(fs,
              named_struct(
                'cap', CAST({cap_mult} AS BIGINT)
                       * ifnull(array_max(transform(fs, x -> x.s)),
                                CAST(0 AS BIGINT)),
                'bins', CAST(array() AS array<bigint>),
                'asg', CAST(array() AS array<bigint>)),
              (acc, f) -> element_at(
                transform(array({_FFD_TGT}), tgt -> named_struct(
                  'cap', acc.cap,
                  'bins', CASE WHEN tgt <= size(acc.bins)
                          THEN transform(acc.bins, (b, i) ->
                                 CASE WHEN CAST(i + 1 AS BIGINT) = tgt
                                      THEN b + f.s ELSE b END)
                          ELSE concat(acc.bins, array(f.s)) END,
                  'asg', concat(acc.asg, array(tgt)))), 1))
            """
        ).alias("st"),
    )
    zipped = folded.select(
        F.explode(
            F.expr(
                "transform(CASE WHEN size(fs) = 0"
                " THEN CAST(array() AS array<int>)"
                " ELSE sequence(1, size(fs)) END, i -> named_struct("
                "'fid', element_at(fs, i).fid,"
                " 's', element_at(fs, i).s,"
                " 'bin', element_at(st.asg, i)))"
            )
        ).alias("a")
    )
    return zipped.select(
        F.col("a.fid").alias("file_id"),
        F.col("a.s").alias("size_bytes"),
        F.col("a.bin").alias("bin"),
    )


def compaction_nextfit(
    files: DataFrame, fid_col: str, size_col: str, cap_mult: int = 2
) -> DataFrame:
    """Sorted next-fit compaction: order files by (size desc, id),
    running-sum their sizes with the distributed
    :func:`rank.global_prefix_sum`, and cut bins at capacity quotients
    (``bin = 1 + cum_exclusive div cap``).

    This is the packing Delta OPTIMIZE-style compactors actually run at
    metadata scale: fully distributed (one range shuffle), no
    sequential fold, at the price of bins overflowing by at most one
    file past the quotient boundary. Use :func:`compaction_plan` (exact
    FFD, single bounded fold) for per-partition-group file batches;
    use this for the whole-table sweep where n_files is itself big
    data. Capacity is ``cap_mult * max(size)``, like FFD's.
    """
    sized = files.select(
        F.col(fid_col).cast("long").alias("fid"),
        F.col(size_col).cast("long").alias("s"),
    )
    cap = sized.agg(
        (F.lit(cap_mult).cast("long") * F.max("s")).alias("cap")
    )
    run = global_prefix_sum(
        sized.withColumn("negs", -F.col("s")), ["negs", "fid"], "s", "cum"
    )
    return run.crossJoin(F.broadcast(cap)).select(
        F.col("fid").alias("file_id"),
        F.col("s").alias("size_bytes"),
        F.expr("1 + (cum - s) div cap").alias("bin"),
    )


def range_partition_plan(
    df: DataFrame, value_col: str, key_col: str, n_buckets: int = 32
) -> DataFrame:
    """Balanced range-partition boundaries over (value_col, key_col).

    Bucket k (1-based) covers global ranks ((k-1)*n)//nb + 1 through
    (k*n)//nb of the total order; its upper bound is the (value, key)
    pair at rank (k*n)//nb. This is what a sort-based writer or
    ``repartitionByRange`` needs to produce near-equal partitions —
    computed with the distributed :func:`rank.global_rank`, never a
    bare ORDER BY window.

    Returns one row per non-empty bucket: (bucket, n_rows, hi_value,
    hi_key). Exact integer rank arithmetic; ``value_col`` must be
    integral (callers snap money to cents first).
    """
    spark = df.sparkSession
    n = df.count()
    ranked = global_rank(
        df.select(
            F.col(value_col).cast("long").alias("v"),
            F.col(key_col).cast("long").alias("k"),
        ),
        ["v", "k"],
    )
    # (k*n) div nb and ((k-1)*n) div nb as exact integer ranks.
    bounds = spark.range(1, n_buckets + 1).select(
        F.col("id").cast("long").alias("bucket"),
        F.expr(f"(id * {n}) div {n_buckets}").cast("long").alias("hi_rank"),
        F.expr(f"((id - 1) * {n}) div {n_buckets}").cast("long").alias("lo_rank"),
    ).where(F.col("hi_rank") > F.col("lo_rank"))
    return (
        ranked.join(F.broadcast(bounds), ranked.r == bounds.hi_rank)
        .select(
            "bucket",
            (F.col("hi_rank") - F.col("lo_rank")).alias("n_rows"),
            F.col("v").alias("hi_value"),
            F.col("k").alias("hi_key"),
        )
    )
