"""C4-style corpus cleaning — Raffel et al. 2020 ("Exploring the Limits
of Transfer Learning…", the C4 dataset rules), re-expressed as one
declarative Spark plan. Engine-added LLM-pipeline operator (no pyhydroqc
counterpart).

The published rules, per document:

* drop the whole page when it contains ``lorem ipsum`` or a curly brace
  (code), case-insensitively;
* keep only lines that end in terminal punctuation, have at least
  ``min_words`` words, and do not contain ``javascript``;
* corpus-level dedup: of every line that occurs more than once in the
  corpus, keep exactly one occurrence (C4 does this for three-sentence
  spans; line granularity is the common reproduction, and the span
  variant is :func:`pyhydroqc_spark.textops.dedup.dup_spans`).

Scale design: line filters are pure column predicates fused into the
scan; the corpus-level keep-one election is a windowed MIN over the line
hash WITHOUT an ORDER BY (min of the combined (doc, pos) key — no sort,
no row_number, streams through the one hash exchange the same way
``dup_spans`` counts grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _hash64

# combined (doc, line) election key: line position fits 20 bits (a
# million-line document), keeping id * 2^20 + pos inside BIGINT for any
# realistic doc-id space
_POS_BITS = 20


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    dedup_lines: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, clean_text, n_lines_kept, doc_dropped): apply the C4 cleaning
    rules. ``clean_text`` is the surviving lines re-joined with newlines
    (empty when nothing survives); ``doc_dropped`` marks pages removed
    wholesale by the lorem-ipsum/brace rule. Keep-one election is
    deterministic: the occurrence with the smallest (id, line position)
    survives."""
    lid = F.col(id_col).cast("long")
    low = F.lower(F.col(text_col))
    doc_dropped = low.contains("lorem ipsum") | low.contains("{")
    base = df.select(lid.alias("id"), F.col(text_col).alias("__t"), doc_dropped.alias("__bad"))

    lines = base.select(
        "id", "__bad", F.posexplode(F.split("__t", r"\n")).alias("pos", "line")
    ).withColumn("__l", F.trim(F.col("line")))
    lw = F.lower(F.col("__l"))
    keep = (
        (~F.col("__bad"))
        & (F.size(F.array_remove(F.split(F.col("__l"), r"\s+"), "")) >= min_words)
        & lw.rlike(r'[.!?"]$')
        & ~lw.contains("javascript")
    )
    kept = lines.where(keep).select("id", "pos", "__l")

    if dedup_lines:
        key = F.shiftleft(F.col("id"), _POS_BITS) + F.col("pos")
        w = Window.partitionBy("__lh")
        kept = (
            kept.withColumn("__lh", _hash64(F.lower(F.col("__l")), hash_fn))
            .withColumn("__k", key)
            .withColumn("__mk", F.min("__k").over(w))
            .where(F.col("__k") == F.col("__mk"))
            .select("id", "pos", "__l")
        )

    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "__l"))),
                lambda s: s["__l"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )
    return base.select("id", "__bad").join(rebuilt, "id", "left").select(
        "id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        F.col("__bad").alias("doc_dropped"),
    )
