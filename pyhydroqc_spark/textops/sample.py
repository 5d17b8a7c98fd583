"""Deterministic sampling and data-mixture selection for training corpora.

Every selection here is keyed on a 60-bit md5 hash of the row key — NOT
``rand()`` — because at cluster scale a sample must be (a) reproducible
across task retries and re-runs (a retried task re-draws ``rand()`` and
the sample silently changes), (b) stable under repartitioning, and
(c) replayable by any other engine for audit. ``u = md5_60(key|seed) /
2^60`` is a uniform [0,1) draw that every row carries intrinsically;
changing ``seed`` re-draws the whole design.

Three surfaces, in increasing structure:

* ``hash_sample`` — Bernoulli(fraction) over the corpus. A pure filter:
  no shuffle, no state, rides the scan. This is the only sampling shape
  that costs literally nothing at 100 TB.
* ``stratified_sample`` — exactly ``n`` rows per group (language,
  source, domain), the smallest-u rows winning. The naive plan — a
  window rank over ``partitionBy(group)`` — shuffle-sorts the ENTIRE
  corpus into one task per group (a language is a single partition!).
  Instead: because the winners are exactly the u-prefix of each group,
  a threshold prefilter ``u < safety·n/|group|`` shrinks the sort input
  to ~``safety·n`` rows per group (megabytes, not terabytes), and a
  per-group validation term falls back to the full window ONLY for
  groups where the prefilter provably under-captured (c < n while the
  group had ≥ n rows) — so the result is exact always, and the
  fallback branch is empty with overwhelming probability
  (P[Binomial(g, 4n/g) < n] — Chernoff-small for safety=4).
* ``token_budget_sample`` — the data-mixture primitive: greedily take
  docs in u-order per group until a token/char budget is consumed
  (keep while the budget spent BEFORE the doc is < budget, so every
  group with any data contributes ≥ 1 doc and overshoot is < 1 doc).
  Same prefilter trick; the validation term is "the candidate prefix
  carries ≥ the budget (or is the whole group)".

All column expressions; the only shuffles are the tiny group-size
aggregate and the candidate-set sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TWO60 = float(1 << 60)


def _u01(key, seed: str):
    """Uniform [0,1) from the portable 60-bit md5 fold (replayable in
    any SQL engine: md5 → first 15 hex chars → bigint / 2^60)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit("|" + seed))), 1, 15),
        16,
        10,
    ).cast("long")
    return h / F.lit(_TWO60)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample: keep rows whose hash-u
    falls below ``fraction``. Retry-stable, repartition-stable, and the
    complement (``u >= fraction``) is the exact holdout — so a
    train/eval split is two filters over one scan, no bookkeeping."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(_u01(F.col(key_col), seed) < fraction)


def _group_sizes(df: DataFrame, group_col: str, weight_col: str | None):
    aggs = [F.count("*").alias("__g_n")]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col).cast("double")).alias("__g_w"))
    return df.groupBy(group_col).agg(*aggs)


def stratified_sample(
    df: DataFrame,
    n_per_group: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "s0",
    safety: float = 4.0,
    prefilter: bool = True,
) -> DataFrame:
    """Exactly ``min(n_per_group, |group|)`` rows per group — the rows
    with the smallest hash-u (ties broken by key; u-collisions need an
    md5-60 collision). ``prefilter=True`` is the scale path described in
    the module docstring; ``prefilter=False`` is the naive full window
    (kept for oracle comparison and tiny inputs)."""
    if n_per_group <= 0:
        raise ValueError("n_per_group must be positive")
    u = _u01(F.col(key_col), seed).alias("__u")
    base = df.select("*", u)
    w = Window.partitionBy(group_col).orderBy("__u", key_col)
    if not prefilter:
        return (
            base.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n_per_group)
            .drop("__u", "__rn")
        )

    sizes = _group_sizes(df, group_col, None)
    thr = F.least(F.lit(1.0), F.lit(float(safety * n_per_group)) / F.col("__g_n"))
    cand = (
        base.join(F.broadcast(sizes), group_col)
        .where(F.col("__u") < thr)
        .drop("__g_n")
    )
    # validation: the u-prefix captured enough rows — c >= n, or c == g
    # (the thr==1 whole-group case). Failing groups (measure-zero) take
    # the exact full-window branch; the union keeps the result exact.
    cstat = cand.groupBy(group_col).agg(F.count("*").alias("__c_n"))
    ok = (
        F.broadcast(sizes)
        .join(F.broadcast(cstat), group_col, "left")
        .select(
            group_col,
            (
                (F.coalesce("__c_n", F.lit(0)) >= n_per_group)
                | (F.coalesce("__c_n", F.lit(0)) == F.col("__g_n"))
            ).alias("__ok"),
        )
    )
    good = (
        cand.join(F.broadcast(ok.where("__ok").select(group_col)), group_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__u", "__rn")
    )
    bad = (
        base.join(F.broadcast(ok.where("NOT __ok").select(group_col)), group_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__u", "__rn")
    )
    return good.unionByName(bad)


def token_budget_sample(
    df: DataFrame,
    budget: float,
    weight_col: str,
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "s0",
    safety: float = 4.0,
    prefilter: bool = True,
) -> DataFrame:
    """Greedy per-group budget fill in hash-u order: keep a doc iff the
    weight consumed before it is `< budget` (every non-empty group
    contributes ≥ 1 doc; overshoot < one doc). This is how training
    mixtures are pinned — "50 B tokens of source A, 10 B of source B" —
    deterministically and replayably. Scale path mirrors
    ``stratified_sample``: prefilter to ``u < safety·(budget/mean_w)/g``
    candidates, validate the candidate prefix carries the budget, fall
    back per-group only on proven under-capture."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    u = _u01(F.col(key_col), seed).alias("__u")
    base = df.select("*", u)
    w = Window.partitionBy(group_col).orderBy("__u", key_col)
    cum_before = F.coalesce(
        F.sum(F.col(weight_col).cast("double")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0.0),
    )
    if not prefilter:
        return base.withColumn("__cb", cum_before).where(
            F.col("__cb") < budget
        ).drop("__u", "__cb")

    sizes = _group_sizes(df, group_col, weight_col)
    # expected docs to fill the budget, at the group's mean weight
    need = F.lit(float(budget)) / (F.col("__g_w") / F.col("__g_n"))
    thr = F.least(
        F.lit(1.0),
        F.greatest(F.lit(float(safety)) * need, F.lit(16.0)) / F.col("__g_n"),
    )
    cand = (
        base.join(F.broadcast(sizes), group_col)
        .where(F.col("__u") < thr)
        .drop("__g_n", "__g_w")
    )
    cstat = cand.groupBy(group_col).agg(
        F.count("*").alias("__c_n"),
        F.sum(F.col(weight_col).cast("double")).alias("__c_w"),
    )
    ok = (
        F.broadcast(sizes)
        .join(F.broadcast(cstat), group_col, "left")
        .select(
            group_col,
            (
                (F.coalesce("__c_w", F.lit(0.0)) >= budget)
                | (F.coalesce("__c_n", F.lit(0)) == F.col("__g_n"))
            ).alias("__ok"),
        )
    )
    good = (
        cand.join(F.broadcast(ok.where("__ok").select(group_col)), group_col)
        .withColumn("__cb", cum_before)
        .where(F.col("__cb") < budget)
        .drop("__u", "__cb")
    )
    bad = (
        base.join(F.broadcast(ok.where("NOT __ok").select(group_col)), group_col)
        .withColumn("__cb", cum_before)
        .where(F.col("__cb") < budget)
        .drop("__u", "__cb")
    )
    return good.unionByName(bad)
