"""Tiered continuous aggregates — 15min / 1h / 1d rollups.

Engine-added operators (north_star): aggregates of the anomaly-corrected
series (`det_cor`, the output of the correction pass — semantics anchor
`/root/reference/pyhydroqc/arima_correct.py:96,151,161,171`).

Scale design:
* the 15min tier aggregates the long fact table: ``groupBy(doc_id, bucket)``
  → partial+final hash aggregation from Catalyst (map-side combine shrinks
  the shuffle by the bucket fan-in, here 1 row per 1..N points);
* coarser tiers re-aggregate the next-finer tier (1h from 15min, 1d from
  1h) — sum/min/max/count compose, avg is recomputed as Σsum/Σcnt; this is
  a ~96× smaller input than re-scanning facts;
* bucket = epoch-floor, a pure column expression (partition-prunable when
  the table is laid out by bucket day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TIER_15MIN = 900
TIER_1H = 3600
TIER_1D = 86400
DEFAULT_TIERS = (TIER_15MIN, TIER_1H, TIER_1D)

AGG_COLS = ["cnt", "sum_val", "avg_val", "min_val", "max_val"]


def bucket_col(ts_col: str, tier_seconds: int):
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / tier_seconds) * tier_seconds
    )


def rollup_points(
    df: DataFrame,
    tier_seconds: int,
    value_col: str = "det_cor",
    ts_col: str = "ts",
    key: str = "doc_id",
    hist: tuple | None = None,
    order_col: str | None = None,
    sum_cols: dict | None = None,
    distinct_col: str | None = None,
) -> DataFrame:
    """Fact rows → one aggregate row per (series, bucket). ``hist=(bins,
    lo, hi)`` rides the composable percentile sketch in the SAME hash
    aggregation (32 extra conditional counts — no second corpus pass, no
    join; this is how a continuous aggregate keeps percentile state next
    to its scalars); ``order_col=`` adds OHLC open/close columns (the
    bucket's first/last value in that order); ``sum_cols={in: out}``
    rides extra plain sums (e.g. counter increments) in the same
    aggregation; ``distinct_col=`` adds a mergeable HLL distinct-count
    sketch (``uniq_sketch``, Spark's native DataSketches aggregate) —
    like the histogram, distinct counts per bucket cannot compose
    tier-from-tier as scalars, but the sketches union exactly."""
    aggs = [
        F.count(value_col).alias("cnt"),
        F.sum(value_col).alias("sum_val"),
        F.avg(value_col).alias("avg_val"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
    ]
    if order_col is not None:
        # open/close: the value at the first/last row of the bucket in
        # order_col order (a unique per-series sequence — pos). With
        # min/max they make the OHLC candle; both compose exactly
        # through rollup_from_rollup (value of the earliest/latest finer
        # bucket), unlike avg which must be recomputed from sums.
        aggs += [
            F.min_by(value_col, order_col).alias("open_val"),
            F.max_by(value_col, order_col).alias("close_val"),
        ]
    for c_in, c_out in (sum_cols or {}).items():
        aggs.append(F.sum(c_in).alias(c_out))
    if distinct_col is not None:
        # hll_sketch_agg takes int/long/string/binary only — hash any
        # type to a stable 64-bit key first (distinct-of-hashes equals
        # distinct up to collisions far below the sketch's own error)
        aggs.append(
            F.hll_sketch_agg(F.xxhash64(distinct_col)).alias("uniq_sketch")
        )
    n_bins = 0
    if hist is not None:
        n_bins, lo, hi = hist
        b = hist_col(value_col, n_bins, lo, hi)
        aggs += [
            F.count(F.when((b == i) & F.col(value_col).isNotNull(), 1)).alias(
                f"__b{i}"
            )
            for i in range(n_bins)
        ]
    out = (
        df.withColumn("bucket_start", bucket_col(ts_col, tier_seconds))
        .groupBy(key, "bucket_start")
        .agg(*aggs)
    )
    if hist is not None:
        keep = [key, "bucket_start", "cnt", "sum_val", "avg_val", "min_val", "max_val"]
        if order_col is not None:
            keep += ["open_val", "close_val"]
        keep += list((sum_cols or {}).values())
        if distinct_col is not None:
            keep.append("uniq_sketch")
        out = out.select(
            *keep,
            F.array(*[F.col(f"__b{i}") for i in range(n_bins)]).alias("hist"),
        )
    return out.withColumn("tier", F.lit(int(tier_seconds)))


def rollup_from_rollup(
    agg_df: DataFrame,
    tier_seconds: int,
    key: str = "doc_id",
    sum_cols: tuple = (),
) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (1h←15min, 1d←1h).
    A ``hist`` sketch column, when present, composes by exact elementwise
    integer sum — the property raw percentiles lack; ``sum_cols`` names
    extra columns that compose by plain sum (counter deltas)."""
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("sum_val").alias("sum_val"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    ]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(c))
    has_uniq = "uniq_sketch" in agg_df.columns
    if has_uniq:
        aggs.append(F.hll_union_agg("uniq_sketch").alias("uniq_sketch"))
    has_ohlc = "open_val" in agg_df.columns
    if has_ohlc:
        # the earliest finer bucket's open / latest finer bucket's close —
        # ordered by the FINE bucket (kept as __fine_b below; the plain
        # bucket_start column is overwritten with the coarse bucket and
        # would be constant within the group)
        aggs += [
            F.min_by("open_val", "__fine_b").alias("open_val"),
            F.max_by("close_val", "__fine_b").alias("close_val"),
        ]
    has_hist = "hist" in agg_df.columns
    if has_hist:
        aggs.append(
            F.aggregate(
                F.collect_list("hist"),
                F.expr("CAST(array() AS array<bigint>)"),
                lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                    F.zip_with(acc, x, lambda a, v: a + v)
                ),
            ).alias("hist")
        )
    cols = [key, "bucket_start", "cnt", "sum_val", "avg_val", "min_val", "max_val"]
    cols += list(sum_cols)
    if has_ohlc:
        cols += ["open_val", "close_val"]
    if has_hist:
        cols.append("hist")
    if has_uniq:
        cols.append("uniq_sketch")
    src = agg_df
    if has_ohlc:
        src = src.withColumn("__fine_b", F.col("bucket_start"))
    return (
        src.withColumn("bucket_start", bucket_col("bucket_start", tier_seconds))
        .groupBy(key, "bucket_start")
        .agg(*aggs)
        .withColumn("avg_val", F.col("sum_val") / F.col("cnt"))
        .select(*cols)
        .withColumn("tier", F.lit(int(tier_seconds)))
    )


def rollup_all_tiers(
    df: DataFrame,
    tiers=DEFAULT_TIERS,
    value_col: str = "det_cor",
    ts_col: str = "ts",
    key: str = "doc_id",
) -> dict[int, DataFrame]:
    """All tiers, each coarser one derived tier-from-tier."""
    tiers = sorted(tiers)
    out: dict[int, DataFrame] = {}
    finest = rollup_points(df, tiers[0], value_col, ts_col, key)
    out[tiers[0]] = finest
    prev = finest
    for t in tiers[1:]:
        prev = rollup_from_rollup(prev.drop("tier"), t, key)
        out[t] = prev
    return out


# -- gap-fill (the TimescaleDB time_bucket_gapfill / locf / interpolate
#    read-side operators over continuous aggregates) ------------------------

FILL_STRATEGIES = ("null", "zero", "locf", "interpolate")


def gapfill(
    agg_df: DataFrame,
    tier_seconds: int,
    fill: dict[str, str] | None = None,
    key: str = "doc_id",
    bucket: str = "bucket_start",
) -> DataFrame:
    """Densify a rollup tier onto the full per-series bucket grid and fill
    the holes — the `time_bucket_gapfill` read operator every dashboard
    query over a continuous aggregate needs (a 15min tier with a 2h
    outage must plot 8 empty buckets, not silently skip them).

    ``fill`` maps column → strategy: ``"zero"`` (counts), ``"locf"``
    (last observation carried forward — only forward, leading holes stay
    NULL), ``"interpolate"`` (linear in bucket TIME between the nearest
    real buckets either side — strictly between known points, NULL
    outside, the TimescaleDB semantics), ``"null"`` (densify only).
    Default: cnt→zero, sum_val→zero, avg/min/max→interpolate when
    present. An ``is_gap`` column marks synthesized rows.

    Scale shape — gapfill runs on AGGREGATE tables (already bucket-fanned
    down from facts): one map-side-combined (min, max) per series, the
    dense grid generated by ``sequence``+``explode`` from that one row
    per series (rows ∝ buckets, no shuffle beyond the tiny agg), a join
    back on (key, bucket), then ONE exchange+sort per direction for the
    fill windows. Both the backward and forward scans are RUNNING frames
    (unboundedPreceding..current over asc and desc order) — never a
    ``currentRow..unboundedFollowing`` frame, which Spark evaluates
    O(n²) per partition."""
    from pyspark.sql import Window

    if fill is not None:
        fill = dict(fill)
    else:
        # default: counts/sums zero-fill, numeric stats interpolate;
        # non-numeric columns (hist array, uniq_sketch binary) densify
        # only — interpolation arithmetic over them fails plan analysis
        from pyspark.sql.types import NumericType

        types = {f.name: f.dataType for f in agg_df.schema.fields}
        fill = {
            c: (
                "zero"
                if c in ("cnt", "sum_val")
                else (
                    "interpolate"
                    if isinstance(types[c], NumericType)
                    else "null"
                )
            )
            for c in agg_df.columns
            if c not in (key, bucket, "tier")
        }
    for c, s in fill.items():
        if s not in FILL_STRATEGIES:
            raise ValueError(f"unknown fill strategy {s!r} for {c!r}")
        if c not in agg_df.columns:
            raise ValueError(f"fill column {c!r} not in frame")

    step = int(tier_seconds)
    b = F.unix_timestamp(F.col(bucket))
    span = agg_df.groupBy(key).agg(
        F.min(b).alias("__lo"), F.max(b).alias("__hi")
    )
    grid = span.select(
        key,
        F.explode(F.sequence("__lo", "__hi", F.lit(step))).alias("__b"),
    ).select(key, F.timestamp_seconds("__b").alias(bucket))

    dense = grid.join(
        agg_df.withColumn("__real", F.lit(True)), [key, bucket], "left"
    )
    asc = (
        Window.partitionBy(key)
        .orderBy(F.col(bucket).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    desc = (
        Window.partitionBy(key)
        .orderBy(F.col(bucket).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.unix_timestamp(F.col(bucket))
    out_cols = []
    for c in agg_df.columns:
        if c in (key, bucket) or c not in fill or fill[c] == "null":
            if c not in (key, bucket):
                out_cols.append(F.col(c))
            continue
        s = fill[c]
        if s == "zero":
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif s == "locf":
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(asc).alias(c))
        else:  # interpolate
            pv = F.last(F.col(c), ignorenulls=True).over(asc)
            pt = F.last(
                F.when(F.col(c).isNotNull(), t), ignorenulls=True
            ).over(asc)
            nv = F.last(F.col(c), ignorenulls=True).over(desc)
            nt = F.last(
                F.when(F.col(c).isNotNull(), t), ignorenulls=True
            ).over(desc)
            interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                pv + (nv - pv) * (t - pt) / (nt - pt)
            )
            out_cols.append(interp.alias(c))
    return dense.select(
        key,
        bucket,
        *out_cols,
        F.coalesce(~F.col("__real"), F.lit(True)).alias("is_gap"),
    )


# -- composable percentile sketches (fixed-bin histograms) -------------------
#
# Percentiles do NOT compose tier-from-tier (the p95 of a day is not a
# function of its hours' p95s), so engines that keep continuous aggregates
# store a mergeable SKETCH per bucket and derive percentiles at read time
# (TimescaleDB percentile_agg / DataSketches). Here: a fixed-bin histogram —
# integer counts, so tier composition is an exact elementwise vector sum,
# replayable bit-for-bit by any SQL engine (no float wobble, unlike
# t-digest), at 8·bins bytes per bucket.


def hist_col(value_col: str, bins: int, lo: float, hi: float):
    """Bin index per row: clamp(floor((v-lo)/(hi-lo)·bins)) — out-of-domain
    values land in the edge bins (sketch semantics, nothing dropped)."""
    raw = F.floor((F.col(value_col) - lo) / (hi - lo) * bins).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def hist_points(
    df: DataFrame,
    tier_seconds: int,
    bins: int = 32,
    lo: float = -5.0,
    hi: float = 30.0,
    value_col: str = "det_cor",
    ts_col: str = "ts",
    key: str = "doc_id",
) -> DataFrame:
    """(key, bucket_start, hist array<long>): one histogram per bucket,
    built in ONE hash aggregation (conditional-count per bin — the same
    codegen-fold shape as the simhash/minhash aggregates; no explode, no
    second shuffle)."""
    b = hist_col(value_col, bins, lo, hi)
    aggs = [
        F.count(F.when((b == i) & F.col(value_col).isNotNull(), 1)).alias(f"__b{i}")
        for i in range(bins)
    ]
    return (
        df.withColumn("bucket_start", bucket_col(ts_col, tier_seconds))
        .groupBy(key, "bucket_start")
        .agg(*aggs)
        .select(
            key,
            "bucket_start",
            F.array(*[F.col(f"__b{i}") for i in range(bins)]).alias("hist"),
        )
    )


def hist_from_hist(
    hist_df: DataFrame, tier_seconds: int, key: str = "doc_id"
) -> DataFrame:
    """Compose a coarser tier's histograms from a finer tier's: exact
    elementwise integer sum (1h ← 15min, 1d ← 1h) — the property raw
    percentiles lack. `zip_with` fold over the ≤fan-in collected arrays
    stays JVM-side; the shuffle carries one sketch per bucket."""
    return (
        hist_df.withColumn("bucket_start", bucket_col("bucket_start", tier_seconds))
        .groupBy(key, "bucket_start")
        .agg(
            F.aggregate(
                F.collect_list("hist"),
                F.expr("CAST(array() AS array<bigint>)"),
                lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                    F.zip_with(acc, x, lambda a, v: a + v)
                ),
            ).alias("hist")
        )
    )


def hist_stats(hist_df: DataFrame, quantiles=(0.5, 0.95)) -> DataFrame:
    """Read-side derivation from the sketch: total count, an
    order-weighted checksum (Σ cnt_b·(b+1) — pins the full histogram in
    one integer), and the bin index of each requested quantile (smallest
    bin whose cumulative count covers q·total, decided in exact integer
    arithmetic: 100·cum ≥ q·100·total)."""
    bins = F.size("hist")
    idx = F.sequence(F.lit(1), bins)
    total = F.aggregate("hist", F.lit(0).cast("long"), lambda a, x: a + x)
    checksum = F.aggregate(
        F.zip_with("hist", idx, lambda c, i: c * i.cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    out = hist_df.select(
        "*",
        total.alias("hist_n"),
        checksum.alias("hist_checksum"),
    )
    # each quantile bin in ONE O(bins) fold (a slice-sum cumulative array
    # is O(bins²) of interpreted HOF ops per bucket — measured ~2s over
    # 130k buckets at sf0.1): carry (cumulative, found-bin, index) through
    # a struct accumulator and keep the first bin whose cumulative count
    # crosses q·total in exact integer arithmetic
    qcols = []
    for q in quantiles:
        qi = int(round(q * 100))
        hn = F.col("hist_n")
        fold = F.aggregate(
            "hist",
            F.struct(
                F.lit(0).cast("long").alias("c"),
                F.lit(None).cast("int").alias("b"),
                F.lit(0).cast("int").alias("i"),
            ),
            lambda acc, x: F.struct(
                (acc["c"] + x).alias("c"),
                F.coalesce(
                    acc["b"],
                    F.when(
                        (100 * (acc["c"] + x) >= qi * hn) & (hn > 0), acc["i"]
                    ),
                ).alias("b"),
                (acc["i"] + 1).alias("i"),
            ),
        )
        qcols.append(fold["b"].cast("int").alias(f"p{qi}_bin"))
    return out.select("*", *qcols)


# -- counter aggregates (Prometheus increase() / TimescaleDB counter_agg) ----


def counter_increment_expr(v, prev, reset_aware: bool = True):
    """The per-row counter-increment column expression given the value and
    its within-series predecessor — exposed so callers that already pay a
    window over (key, order) (e.g. a row_number pass) can ride the SAME
    exchange+sort instead of adding a second one (guide §2.4)."""
    return (
        F.when(prev.isNull() | v.isNull(), F.lit(0.0))
        .when(v >= prev, v - prev)
        .otherwise(v if reset_aware else F.lit(0.0))
    )


def with_counter_increments(
    df: DataFrame,
    value_col: str = "det_cor",
    key: str = "doc_id",
    order_col: str = "ts",
    out_col: str = "increment",
    reset_aware: bool = True,
) -> DataFrame:
    """Per-row counter increment under monotonic-counter semantics: the
    rise since the previous sample, and on a reset (value < previous —
    the process restarted and the counter rebooted at 0) the new value
    itself counts as the increase (the Prometheus ``increase()`` rule).
    First sample of a series contributes 0.

    Computed BEFORE bucketing, so bucket sums of the increment column
    compose exactly through every tier (the per-row increment at a
    bucket boundary belongs to the row's own bucket, and a coarser
    bucket's delta is the plain sum of its finer buckets' deltas —
    unlike max-minus-min-per-bucket, which loses cross-boundary rises).
    One window (exchange+sort per key), then it rides any rollup."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    v = F.col(value_col)
    return df.withColumn(out_col, counter_increment_expr(v, prev, reset_aware))


def uniq_estimate(agg_df: DataFrame, out_col: str = "uniq_est") -> DataFrame:
    """Read-side distinct-count estimate from the ``uniq_sketch`` column
    (±~1.6% at the default lgK=12; 2-4 KB of state per bucket)."""
    return agg_df.withColumn(out_col, F.hll_sketch_estimate("uniq_sketch"))
