"""The published LLM-curation stack as ONE composition.

Every stage exists as a standalone, individually-gated operator; this
module chains them in the canonical published order so a user runs the
whole pipeline in one call and gets both the surviving corpus and a
per-document decision ledger (every drop carries its reason — at corpus
scale the drop-reason histogram is the first thing a curation run
reports, and "silently smaller output" is never an acceptable result):

1. PII scrub            (pii.scrub — detect+redact, rides the scan)
2. C4 page/line rules   (clean.c4_clean — Raffel 2020)
3. exact-substring strip (dedup.strip_dup_spans — Lee 2022)
4. Gopher quality filter (quality.gopher_filter — Rae 2021 A1.1)
5. benchmark decontamination (quality.ngram_contamination, 13-gram)
6. LM-perplexity band   (quality.ngram_perplexity, corpus-trained)
7. near-dup keep-list   (jaccard/minhash pairs → dup_components CC)

Text-REWRITING stages (1-3) feed each other; FILTER stages (4-7) are
all evaluated against the stage-3 text so their reasons are independent
(a doc can carry both 'gopher:stopwords' and 'near_dup' — the audit
wants the complete diagnosis, not the first kill). The final keep is
the conjunction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import clean, dedup, pii as pii_mod, quality


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scrub_pii: bool = True,
    c4: bool = True,
    strip_spans: bool = True,
    span_n: int = 12,
    gopher: bool = True,
    gopher_kwargs: dict | None = None,
    bench_df: DataFrame | None = None,
    perplexity_band: tuple | None = None,
    near_dup: str | None = "minhash",
    near_dup_threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, text, keep, reasons array<string>): the full stack.

    ``text`` is the rewritten text (PII-redacted, C4-line-filtered,
    duplicated spans stripped); ``reasons`` collects every failed gate
    ('c4_page', 'gopher:<rule>', 'contaminated', 'perplexity',
    'near_dup'); ``keep`` = no reasons. ``bench_df`` enables stage 5;
    ``perplexity_band=(lo, hi)`` drops docs whose corpus-trained bigram
    log2-perplexity falls outside the band (both tails are suspect:
    too low = boilerplate, too high = garbage); ``near_dup`` is
    'minhash' (signature-jaccard pairs → connected components) |
    'exact' (text digest) | None."""
    base = docs.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
    )
    reasons = []

    # --- rewriting stages -------------------------------------------------
    cur = base
    if scrub_pii:
        cur = pii_mod.scrub(cur, id_col="id", text_col="text").select("id", "text")
    if c4:
        cleaned = clean.c4_clean(cur, id_col="id", text_col="text", hash_fn=hash_fn)
        reasons.append(
            cleaned.select(
                "id", F.when(F.col("doc_dropped"), F.lit("c4_page")).alias("__r")
            )
        )
        cur = cleaned.select("id", F.col("clean_text").alias("text"))
    if strip_spans:
        stripped = dedup.strip_dup_spans(
            cur, n=span_n, id_col="id", text_col="text", hash_fn=hash_fn
        )
        cur = stripped.select("id", F.col("clean_text").alias("text"))

    # every filter below reads the final rewritten text exactly once per
    # operator; persist it so Catalyst's tree expansion cannot re-run the
    # whole rewrite chain per filter reference (the ngram_perplexity
    # lesson — plans are trees, not DAGs)
    from pyspark import StorageLevel

    cur = cur.persist(StorageLevel.MEMORY_AND_DISK)

    # --- filter stages (independent diagnoses over the same text) ---------
    if gopher:
        g = quality.gopher_filter(
            cur, id_col="id", text_col="text", **(gopher_kwargs or {})
        )
        reasons.append(
            g.select(
                "id",
                F.explode_outer(
                    F.transform(
                        "fail_reasons", lambda r: F.concat(F.lit("gopher:"), r)
                    )
                ).alias("__r"),
            )
        )
    if bench_df is not None:
        bench_norm = bench_df.select(
            F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
        )
        cont = quality.ngram_contamination(
            cur, bench_norm, n=13, id_col="id", text_col="text"
        )
        reasons.append(
            cont.select(
                "id", F.when(F.col("contaminated"), F.lit("contaminated")).alias("__r")
            )
        )
    if perplexity_band is not None:
        lo, hi = perplexity_band
        ppl = quality.ngram_perplexity(cur, id_col="id", text_col="text")
        reasons.append(
            ppl.select(
                "id",
                F.when(
                    F.col("log2_ppl").isNotNull()
                    & (~F.col("log2_ppl").between(lo, hi)),
                    F.lit("perplexity"),
                ).alias("__r"),
            )
        )
    # an EMPTY rewritten doc (C4 can strip every line) carries nothing to
    # deduplicate and is already diagnosed by the quality gates — and at
    # corpus scale a million empty strings are one giant identical-
    # signature bucket (a quadratic pair enumeration for zero information)
    nonempty = cur.where(F.length("text") > 0)
    if near_dup == "minhash":
        sig = dedup.minhash_signatures(
            nonempty, id_col="id", text_col="text", hash_fn=hash_fn
        )
        cand = dedup.minhash_candidates(sig, hash_fn=hash_fn)
        verified = (
            cand.join(
                sig.select(F.col("id").alias("id_a"), F.col("signature").alias("__sa")),
                "id_a",
            )
            .join(
                sig.select(F.col("id").alias("id_b"), F.col("signature").alias("__sb")),
                "id_b",
            )
            .where(
                F.size(
                    F.filter(F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda v: v)
                )
                / F.size("__sa")
                >= near_dup_threshold
            )
            .select("id_a", "id_b")
        )
        comp = dedup.dup_components(verified, corpus=nonempty, corpus_id="id")
        reasons.append(
            comp.select(
                "id" if "id" in comp.columns else F.col("doc_id").alias("id"),
                F.when(~F.col("keep"), F.lit("near_dup")).alias("__r"),
            )
        )
    elif near_dup == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy(F.md5("text"))
        ex = nonempty.select(
            "id", (F.col("id") == F.min("id").over(w)).alias("__keep")
        )
        reasons.append(
            ex.select("id", F.when(~F.col("__keep"), F.lit("near_dup")).alias("__r"))
        )
    elif near_dup is not None:
        raise ValueError(f"near_dup must be minhash|exact|None, got {near_dup!r}")

    all_r = None
    for r in reasons:
        r = r.where(F.col("__r").isNotNull())
        all_r = r if all_r is None else all_r.unionByName(r)
    if all_r is None:
        return cur.select("id", "text", F.lit(True).alias("keep"),
                          F.expr("CAST(array() AS array<string>)").alias("reasons"))
    agg = all_r.groupBy("id").agg(F.array_sort(F.collect_set("__r")).alias("reasons"))
    return (
        cur.join(agg, "id", "left")
        .select(
            "id",
            "text",
            F.coalesce("reasons", F.expr("CAST(array() AS array<string>)")).alias(
                "reasons"
            ),
        )
        .select("id", "text", (F.size("reasons") == 0).alias("keep"), "reasons")
    )


def drop_report(curated: DataFrame) -> DataFrame:
    """(reason, n_docs): the drop-reason histogram — what a curation run
    reports first. A doc with several diagnoses counts under each."""
    return (
        curated.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"))
    )
