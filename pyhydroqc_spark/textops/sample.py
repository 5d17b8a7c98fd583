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
  corpus into one task per group: a language-sized stratum is a single
  sort task, which at corpus scale is not slow but IMPOSSIBLE (one
  executor owns terabytes). Instead: because the winners are exactly
  the u-prefix of each group, a threshold prefilter
  ``u < safety·n/|group|`` shrinks the sort input to ~``safety·n``
  rows per group (megabytes, not terabytes). The candidate set is
  persisted (it is tiny by construction) and a per-group validation —
  an eager, bounded driver decision over one row per group — adds a
  fallback full-window branch ONLY for groups where the prefilter
  provably under-captured (c < n while the group had ≥ n rows), so
  the result is exact always and the common case runs no fallback at
  all (P[Binomial(g, 4n/g) < n] is Chernoff-small for safety=4).

  Cost shape: two corpus scans (group sizes, candidate filter — both
  pure map-side) + a sort of the candidates, versus the naive plan's
  one scan + full-corpus shuffle-sort. Below ~10M rows per executor
  the naive window is FASTER (scans dominate; measured in
  BENCH/TEXTOPS.md) — ``prefilter=False`` exists for exactly that
  regime; the default stays True because the engine's posture is the
  regime where the full sort stops being an option.
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


def _in_failed(group_col: str, failed: list):
    """NULL-safe membership in the failed-group list: a NULL stratum must
    route to the fallback branch when it failed and stay in the good
    branch otherwise — plain ``isin`` returns NULL for NULL group values,
    which silently dropped the whole stratum from both branches."""
    vals = [f for f in failed if f is not None]
    expr = F.coalesce(
        F.col(group_col).isin(vals) if vals else F.lit(False), F.lit(False)
    )
    if any(f is None for f in failed):
        expr = expr | F.col(group_col).isNull()
    return expr


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
    # localCheckpoint the candidates (~safety·n rows per group BY
    # CONSTRUCTION): every downstream reference (validation, the rank)
    # reads the materialized blocks, never the corpus again (plans are
    # trees: unmaterialized, cand would re-expand its corpus scan per
    # reference). Checkpoint, NOT persist: a persist was never
    # unpersisted — a cache-entry leak across calls — while checkpoint
    # blocks are reclaimed by the ContextCleaner once the returned frame
    # is garbage-collected (the dup_components pattern).
    cand = (
        base.join(F.broadcast(sizes), group_col)
        .where(F.col("__u") < thr)
        .localCheckpoint(eager=True)
    )
    # validation: the u-prefix captured enough rows — c >= n, or c == g
    # (the thr==1 whole-group case). This is an EAGER driver decision
    # over one boolean per group (strata are few by construction — a
    # bounded action, like the ADC query-side collects): in the common
    # case the fallback branch is never even built, so the corpus is
    # scanned exactly twice, not three times.
    cstat = cand.groupBy(group_col).agg(F.count("*").alias("__c_n"))
    failed = [
        r[0]
        for r in sizes.join(cstat, group_col, "left")  # left: an empty
        # candidate set must still fail validation, not vanish from it
        .where(
            (F.coalesce("__c_n", F.lit(0)) < n_per_group)
            & (F.coalesce("__c_n", F.lit(0)) != F.col("__g_n"))
        )
        .select(group_col)
        .collect()
    ]
    good = (
        cand.drop("__g_n")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__u", "__rn")
    )
    if not failed:
        return good
    in_failed = _in_failed(group_col, failed)
    bad = (
        base.where(in_failed)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__u", "__rn")
    )
    return good.where(~in_failed).unionByName(bad)


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
    # localCheckpoint, not persist — see stratified_sample
    cand = (
        base.join(F.broadcast(sizes), group_col)
        .where(F.col("__u") < thr)
        .localCheckpoint(eager=True)
    )
    # eager per-group validation (see stratified_sample): the candidate
    # prefix must carry the budget, or be the whole group
    cstat = cand.groupBy(group_col).agg(
        F.count("*").alias("__c_n"),
        F.sum(F.col(weight_col).cast("double")).alias("__c_w"),
    )
    failed = [
        r[0]
        for r in sizes.join(cstat, group_col, "left")  # left: empty
        # candidate sets must fail validation, not vanish from it
        .where(
            (F.coalesce("__c_w", F.lit(0.0)) < budget)
            & (F.coalesce("__c_n", F.lit(0)) != F.col("__g_n"))
        )
        .select(group_col)
        .collect()
    ]
    good = (
        cand.drop("__g_n", "__g_w")
        .withColumn("__cb", cum_before)
        .where(F.col("__cb") < budget)
        .drop("__u", "__cb")
    )
    if not failed:
        return good
    in_failed = _in_failed(group_col, failed)
    bad = (
        base.where(in_failed)
        .withColumn("__cb", cum_before)
        .where(F.col("__cb") < budget)
        .drop("__u", "__cb")
    )
    return good.where(~in_failed).unionByName(bad)
