"""Text analysis for training-data curation — language ID, quality scoring,
token counting, document fingerprinting. All pure column expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny deterministic marker lexicons (public common-word lists)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "pour"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ist"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他"],
}


def _words(text_col: str):
    return F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")


def _stats_cols(text_col: str) -> list:
    w = _words(text_col)
    return [
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        F.length(text_col).cast("long").alias("n_chars"),
        (
            F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            / F.size(w)
        ).alias("avg_word_len"),
    ]


def _quality_col(text_col: str):
    w = _words(text_col)
    n_chars = F.length(text_col)
    alnum = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9\s]", ""))
    diversity = F.size(F.array_distinct(w)) / F.greatest(F.size(w), F.lit(1))
    len_ok = F.when((n_chars >= 64) & (n_chars <= 100000), 1.0).otherwise(
        F.least(n_chars / 64.0, F.lit(1.0))
    )
    return ((len_ok + diversity + alnum / F.greatest(n_chars, F.lit(1))) / 3.0).alias(
        "quality"
    )


def _repetition_cols(text_col: str) -> list:
    # duplicate-line fraction (Gopher/Dolma): share of non-empty lines
    # that repeat an earlier line; NULL when the doc has no lines at all
    lines = F.array_remove(F.split(F.col(text_col), "\n"), "")
    return [
        F.when(
            F.size(lines) > 0,
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
        ).alias("dup_line_frac")
    ]


def _token_cols(text_col: str) -> list:
    w = _words(text_col)
    pieces = F.array_remove(F.split(F.col(text_col), r"[\s\p{Punct}]+"), "")
    subword = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda a, x: a + F.ceil(F.length(x) / 4.0).cast("long"),
    )
    return [F.size(w).cast("long").alias("ws_tokens"), subword.alias("bpe_est_tokens")]


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_words, n_distinct_words, n_chars, avg_word_len)."""
    return df.select(F.col(id_col).alias("id"), *_stats_cols(text_col))


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic [0,1] quality score: length band + lexical diversity +
    alnum ratio (the usual pre-training quality gates)."""
    return df.select(F.col(id_col).alias("id"), _quality_col(text_col))


def text_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Every per-doc text-analysis column (stats + quality + token counts)
    in ONE projection over ONE scan — at corpus scale the separate ops
    joined on id would re-scan the text column once per surface; this is
    the fused form pipelines should use."""
    return df.select(
        F.col(id_col).alias("id"),
        *_stats_cols(text_col),
        _quality_col(text_col),
        *_token_cols(text_col),
        *_repetition_cols(text_col),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: the language whose marker set intersects
    the document's word set most (ties → lexicographic)."""
    w = F.array_distinct(_words(text_col))
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(w, F.array(*[F.lit(m) for m in marks]))
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, marks in sorted(LANG_MARKERS.items())
        ]
    )
    # struct compare is fieldwise: max by hits, ties by ordr = −index so the
    # lexicographically first language wins
    ranked = F.transform(
        F.sequence(F.lit(0), F.lit(len(LANG_MARKERS) - 1)),
        lambda i: F.struct(
            F.element_at(scores, i + 1)["hits"].alias("hits"),
            (-i).alias("ordr"),
            F.element_at(scores, i + 1)["lang"].alias("lang"),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), F.array_max(ranked)["lang"].alias("lang_pred")
    )


def token_count(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (4 chars/token rule +
    punctuation splits — the standard cheap estimator)."""
    return df.select(F.col(id_col).alias("id"), *_token_cols(text_col))


def fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing-style fingerprint: min hash over character k-gram shingles
    (order-insensitive, whitespace-normalized). ``hash_fn="md5"`` uses the
    portable 60-bit md5 hash so plain-SQL engines can replay it."""
    from .dedup import _hash64

    c = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    n = F.length(c)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), n - (k - 1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(F.transform(sh, lambda g: _hash64(g, hash_fn))).alias("fingerprint"),
    )


def ngram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_model: bool = True,
) -> DataFrame:
    """(id, log2_ppl): per-doc bigram-LM perplexity under a model trained
    on the CORPUS ITSELF — the classic statistical quality signal for
    pre-training curation (docs whose word transitions the corpus has
    never seen score high; boilerplate scores low). Add-one smoothing:

        P(w_i | w_{i-1}) = (c2(w_{i-1}, w_i) + 1) / (c1(w_{i-1}) + V)
        log2_ppl(doc)    = −(1/n) · Σ log2 P over the doc's n bigrams

    Physical shape, all JVM-side: the corpus (the posexplode of every
    document into (doc, prev, cur) bigrams) is scanned exactly TWICE —
    once to build the bigram-count table ``c2``, once to score documents
    against the finished model. Everything else derives from ``c2``
    alone: the context counts ``c1`` are a groupBy-sum over c2 (a table
    of distinct bigrams, orders of magnitude smaller than the corpus),
    and the vocabulary size V is a 1-row broadcast aggregate over c2's
    keys — so at 100 TB there are two full-corpus passes, not five.
    Catalyst expands every *reference* to c2 back to its full subtree
    (plans are trees, not DAGs), so with ``cache_model=True`` (default)
    the bigram table — the model, NOT the corpus — is persisted
    memory-and-disk: its one corpus pass runs once and c1/V/model read
    the cache. Pass False for a fully-lazy, side-effect-free plan that
    re-derives c2 per reference (fine for small corpora). The "model"
    never leaves the cluster — at 10^9 docs it is a distributed table,
    not a driver artifact. Docs with <2 words have no bigrams and come
    back with NULL ``log2_ppl`` (reinstated by a left join on the input
    ids)."""
    w = _words(text_col)
    pairs = (
        df.select(F.col(id_col).alias("id"), w.alias("__w"))
        .select(
            "id",
            F.posexplode(F.slice("__w", 2, F.greatest(F.size("__w") - 1, F.lit(0))))
            .alias("__i", "__cur"),
            F.col("__w").alias("__all"),
        )
        .select(
            "id",
            F.element_at("__all", F.col("__i") + 1).alias("prev"),
            F.col("__cur").alias("cur"),
        )
    )
    c2 = pairs.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    if cache_model:
        from pyspark import StorageLevel

        c2 = c2.persist(StorageLevel.MEMORY_AND_DISK)
    # context counts from c2, NOT from a second pairs scan: every
    # occurrence of context w is inside exactly one (w, ·) bigram count
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    # V stays IN the plan (broadcast 1-row aggregate over c2's keys — the
    # distinct words of prev ∪ cur are exactly the words seen in any
    # bigram slot) — no separate driver-blocking count job, and the whole
    # operator remains lazy
    vocab_n = (
        c2.select(F.col("prev").alias("wd"))
        .union(c2.select(F.col("cur").alias("wd")))
        .agg(F.count_distinct("wd").cast("double").alias("__V"))
    )
    model = (
        c2.join(c1, "prev")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "prev", "cur",
            (F.log2((F.col("c2") + 1) / (F.col("c1") + F.col("__V")))).alias("__lp"),
        )
    )
    scored = pairs.join(model, ["prev", "cur"])
    per_doc = scored.groupBy("id").agg((-F.avg("__lp")).alias("log2_ppl"))
    return df.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")


def _gram_df(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, gram): one row per word n-gram occurrence (grams joined by
    single spaces, the same ``_words`` tokenization as every other text
    op). Docs with fewer than n words contribute no rows."""
    base = df.select(F.col(id_col).alias("id"), _words(text_col).alias("__w"))
    grams = F.when(
        F.size("__w") >= n,
        F.expr(
            f"transform(sequence(1, size(__w) - {n - 1}),"
            f" i -> concat_ws(' ', slice(__w, i, {n})))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return base.select("id", F.explode(grams).alias("gram"))


def top_ngram_frac(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, top{n}gram_frac): the fraction of a document's n-gram
    occurrences taken by its single most frequent n-gram — the Gopher
    repetition filter (Rae et al. 2021 use n=2..4; boilerplate and
    template spam light up). NULL for docs with fewer than n words.
    Shape: explode → two hash aggregations, no joins until the final
    id-aligned left join — one corpus pass at any scale."""
    g = _gram_df(df, n, id_col, text_col)
    per = g.groupBy("id", "gram").agg(F.count("*").alias("__c"))
    frac = per.groupBy("id").agg(
        (F.max("__c") / F.sum("__c")).alias(f"top{n}gram_frac")
    )
    return df.select(F.col(id_col).alias("id")).join(frac, "id", "left")


def dup_ngram_frac(
    df: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dup{n}gram_frac): the fraction of a document's n-gram
    occurrences that are repeats of an n-gram already seen in the same
    document (1 − distinct/total) — the Gopher duplicate-n-gram family
    (n=5..10 there). NULL for docs with fewer than n words."""
    g = _gram_df(df, n, id_col, text_col)
    agg = g.groupBy("id").agg(
        (1.0 - F.count_distinct("gram") / F.count("*")).alias(f"dup{n}gram_frac")
    )
    return df.select(F.col(id_col).alias("id")).join(agg, "id", "left")


def ngram_contamination(
    df: DataFrame,
    bench_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_shared_{n}grams, contaminated): benchmark decontamination —
    flag training documents sharing any word n-gram with a benchmark/eval
    set (n=13 is the published GPT-3 decontamination setting; The Pile
    uses the same shape). Scale design: the benchmark gram set is tiny
    against a 100 TB corpus, so both sides hash their grams to 60-bit
    ints (the portable md5 fold every hash-keyed op here uses) and the
    benchmark side is BROADCAST — the corpus streams its grams exactly
    once, no shuffle of the big side. Counts are distinct shared grams
    per document; docs with fewer than n words are trivially clean."""

    def h(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    gd = _gram_df(df, n, id_col, text_col).select("id", h(F.col("gram")).alias("__gh"))
    gb = (
        _gram_df(bench_df, n, id_col, text_col)
        .select(h(F.col("gram")).alias("__gh"))
        .distinct()
    )
    ncol = f"n_shared_{n}grams"
    shared = (
        gd.distinct()
        .join(F.broadcast(gb), "__gh")
        .groupBy("id")
        .agg(F.count("*").alias(ncol))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(shared, "id", "left")
        .select(
            "id",
            F.coalesce(F.col(ncol), F.lit(0)).alias(ncol),
            (F.coalesce(F.col(ncol), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# Gopher quality-filter rules (Rae et al. 2021, Appendix A) — a small
# English stopword presence check is one of them
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
    max_top2gram_frac: float = 0.20,
    max_dup5gram_frac: float = 0.15,
) -> DataFrame:
    """(id, keep, fail_reasons): the Gopher document-quality filter —
    the published rule set (Rae et al. 2021, Appendix A1.1) composed
    from this module's signals into one keep/drop decision with the
    paper's default thresholds, every threshold overridable.

    Rules: word count band; mean word length band; symbol-to-word ratio
    (``#`` and ``...``); bullet-started / ellipsis-ended line fractions;
    fraction of words containing an alphabetic character; presence of at
    least ``min_stopwords`` distinct common stopwords; and the two
    repetition signals (modal-bigram share, duplicate-5-gram share).

    One corpus scan for everything except the n-gram repetition pair
    (each a one-pass aggregation of its own); ``fail_reasons`` is an
    array of rule tags so downstream audits can histogram WHY documents
    die — at 100 TB the drop-reason distribution is the first thing a
    curation run reports."""
    w = _words(text_col)
    nw = F.size(w)
    # empty documents (a C4-cleaned page can lose every line) must FAIL
    # the word_count rule, not blow up the ANSI divide — ratio
    # denominators are clamped to 1, the count checks still see 0
    nw_d = F.greatest(nw, F.lit(1))
    avg_wl = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) / nw_d
    n_symbols = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), r"#", ""))
        + (
            F.length(text_col)
            - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
        )
        / 3
    )
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))
    ) / n_lines
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    ) / n_lines
    alpha_frac = F.size(F.filter(w, lambda x: x.rlike(r"[a-z]"))) / nw_d
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(w),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )

    checks = [
        ("word_count", (nw >= min_words) & (nw <= max_words)),
        ("avg_word_len", (avg_wl >= min_avg_word_len) & (avg_wl <= max_avg_word_len)),
        ("symbol_ratio", (n_symbols / nw_d) <= max_symbol_word_ratio),
        ("bullet_lines", bullet_frac <= max_bullet_line_frac),
        ("ellipsis_lines", ellipsis_frac <= max_ellipsis_line_frac),
        ("alpha_words", alpha_frac >= min_alpha_word_frac),
        ("stopwords", n_stop >= min_stopwords),
    ]
    reasons = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(tag))
                for tag, cond in checks
            ]
        )
    )
    scan = df.select(F.col(id_col).alias("id"), reasons.alias("__r1"))

    top2 = top_ngram_frac(df, n=2, id_col=id_col, text_col=text_col)
    dup5 = dup_ngram_frac(df, n=5, id_col=id_col, text_col=text_col)
    rep = top2.join(dup5, "id").select(
        "id",
        F.array_compact(
            F.array(
                F.when(
                    F.coalesce(F.col("top2gram_frac"), F.lit(0.0)) > max_top2gram_frac,
                    F.lit("top2gram"),
                ),
                F.when(
                    F.coalesce(F.col("dup5gram_frac"), F.lit(0.0)) > max_dup5gram_frac,
                    F.lit("dup5gram"),
                ),
            )
        ).alias("__r2"),
    )
    return scan.join(rep, "id", "left").select(
        "id",
        F.concat(
            F.col("__r1"), F.coalesce(F.col("__r2"), F.expr("array()"))
        ).alias("fail_reasons"),
    ).select(
        "id",
        (F.size("fail_reasons") == 0).alias("keep"),
        "fail_reasons",
    )
