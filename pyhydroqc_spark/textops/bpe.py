"""Byte-pair-encoding tokenizer — trained on the corpus, applied at scale.

The real thing, not the regex approximation in ``quality.token_count``:
merge rules are learned from a corpus word-frequency table (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units" —
implemented from the published algorithm, no tokenizer library), then
applied per word with the learned merge ranks.

Scale design (100 TB corpus):

* **Training** never iterates over the corpus. One distributed pass
  builds the word-TYPE frequency table (``explode`` → map-side-combined
  ``groupBy``); the top ``max_word_types`` types by frequency come to the
  driver (Zipf: 100k types cover the overwhelming mass of any natural
  corpus, and the tail contributes ~nothing to pair counts). The merge
  loop itself runs driver-side over that table — the same shape the
  published BPE trainers use (they operate on a word-count dictionary,
  not the running text).
* **Application** broadcasts the merge ranks (a few hundred KB) and runs
  an Arrow-batched kernel over the documents. A per-batch word-type
  cache means each distinct word is encoded once per batch — Zipf again:
  the cache hit rate is the corpus' type/token ratio (~90%+).

Engine-added LLM-pipeline operator (no pyhydroqc counterpart).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

END = "</w>"  # end-of-word marker, per the paper


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------


def word_freq_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, freq): corpus word-type frequencies — the one distributed
    pass BPE training needs. Map-side partial aggregation means the
    shuffle carries one row per type per input partition."""
    words = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(
    symbols: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(symbols)
    joined = pair[0] + pair[1]
    while i < n:
        if i < n - 1 and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_types: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Deterministic:
    the driver-side type table is ordered (freq DESC, word), and ties in
    pair frequency break lexicographically — same corpus, same rules,
    bit-for-bit. Stops early when no pair repeats."""
    top = (
        word_freq_table(df, id_col, text_col)
        .orderBy(F.desc("freq"), "word")
        .limit(max_word_types)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in top:
        symbols = tuple(r["word"]) + (END,)
        vocab[symbols] = vocab.get(symbols, 0) + int(r["freq"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_word(s, pair): f for s, f in vocab.items()}
    return merges


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging — the paper's apply-time algorithm."""
    symbols: list[str] = list(word) + [END]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_tokens: bool = False,
) -> DataFrame:
    """(id, n_bpe_tokens[, bpe_tokens]): tokenize every document with the
    learned merges. The merge table rides the closure (broadcast by
    Spark's task serializer — hundreds of KB, not data-scale); the kernel
    is Arrow-batched ``mapInPandas`` with a word-type cache per batch, so
    each distinct word is encoded once per batch regardless of how often
    it occurs."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    fields = [
        StructField("id", LongType()),
        StructField("n_bpe_tokens", IntegerType()),
    ]
    if emit_tokens:
        fields.append(StructField("bpe_tokens", ArrayType(StringType())))
    schema = StructType(fields)

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "").alias("__w"),
    )

    def kernel(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = _encode_word(w, ranks)
                cache[w] = got
            return got

        for pdf in pdf_iter:
            ids, counts, toks = [], [], []
            for i, ws in zip(pdf["id"], pdf["__w"]):
                pieces: list[str] = []
                for w in ws:
                    pieces.extend(enc(w))
                ids.append(i)
                counts.append(len(pieces))
                if emit_tokens:
                    toks.append(pieces)
            out = {"id": ids, "n_bpe_tokens": counts}
            if emit_tokens:
                out["bpe_tokens"] = toks
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema)
