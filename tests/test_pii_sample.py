"""PII scrub (textops/pii.py) and deterministic sampling (textops/sample.py)."""

import pandas as pd
import pytest

from pyhydroqc_spark.textops import pii, sample


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "mail me at a.b-c%d+e@foo-bar.example.com or x@y.io thanks"),
        (1, "server 10.0.0.1 and 192.168.255.254, also 1.2.3.4.5"),
        (2, "call +1 555 010 4242 or +44-207-946-0958"),
        (3, "ssn 123-45-6789 and not-ssn 12-345-6789 or 123-45-67890"),
        (4, "clean text with no identifiers at all"),
        (5, "mixed: bob@corp.io from 172.16.0.9, dial +1 800 555 0100, id 987-65-4321"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_pii_counts(spark, pii_docs):
    out = pii.pii_counts(pii_docs).toPandas().set_index("id").sort_index()
    assert out.loc[0].tolist() == [2, 0, 0, 0, 2]
    # 1.2.3.4.5: the first 4 octets match (audit-pass semantics)
    assert out.loc[1].tolist() == [0, 3, 0, 0, 3]
    assert out.loc[2].tolist() == [0, 0, 2, 0, 2]
    assert out.loc[3].tolist() == [0, 0, 0, 1, 1]
    assert out.loc[4].tolist() == [0, 0, 0, 0, 0]
    assert out.loc[5].tolist() == [1, 1, 1, 1, 4]


def test_redact_and_scrub(spark, pii_docs):
    red = pii.redact(pii_docs).toPandas().set_index("id")["redacted"]
    assert red[4] == "clean text with no identifiers at all"
    assert (
        red[5]
        == "mixed: <PII_EMAIL> from <PII_IPV4>, dial <PII_PHONE>, id <PII_SSN>"
    )
    # scrub keeps every other column, rewrites text in place, adds counts
    scr = pii.scrub(pii_docs).toPandas().set_index("doc_id")
    assert scr.loc[5, "text"] == red[5]
    assert scr.loc[5, ["n_email", "n_ipv4", "n_phone", "n_ssn"]].tolist() == [1, 1, 1, 1]
    # spans enumerate each occurrence with its kind
    spans = pii.pii_spans(pii_docs).toPandas()
    got = set(map(tuple, spans[spans["id"] == 5][["kind", "match"]].values))
    assert got == {
        ("email", "bob@corp.io"),
        ("ipv4", "172.16.0.9"),
        ("phone", "+1 800 555 0100"),
        ("ssn", "987-65-4321"),
    }


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(600),
            "lang": ["en", "de", "fr"] * 200,
            "n_chars": [(37 * i) % 400 + 20 for i in range(600)],
        }
    )
    return spark.createDataFrame(pdf)


def test_hash_sample_deterministic_split(spark, corpus):
    a = sorted(r.doc_id for r in sample.hash_sample(corpus, 0.3).select("doc_id").collect())
    b = sorted(r.doc_id for r in sample.hash_sample(corpus, 0.3).select("doc_id").collect())
    assert a == b and 0 < len(a) < 600
    # complement is the exact holdout
    hold = sorted(
        r.doc_id
        for r in corpus.where(
            sample._u01(corpus.doc_id, "s0") >= 0.3
        ).select("doc_id").collect()
    )
    assert sorted(a + hold) == list(range(600))
    with pytest.raises(ValueError):
        sample.hash_sample(corpus, 1.5)


def test_stratified_prefilter_exact(spark, corpus):
    on = sample.stratified_sample(corpus, 25, "lang", prefilter=True).toPandas()
    off = sample.stratified_sample(corpus, 25, "lang", prefilter=False).toPandas()
    key = ["lang", "doc_id"]
    assert sorted(map(tuple, on[key].values)) == sorted(map(tuple, off[key].values))
    assert (on.groupby("lang").size() == 25).all()
    # n larger than a group: the whole group comes back (thr==1 branch)
    small = corpus.where("doc_id < 9")
    allrows = sample.stratified_sample(small, 100, "lang").toPandas()
    assert len(allrows) == 9


def test_token_budget_prefilter_exact(spark, corpus):
    on = sample.token_budget_sample(corpus, 1500.0, "n_chars", "lang").toPandas()
    off = sample.token_budget_sample(
        corpus, 1500.0, "n_chars", "lang", prefilter=False
    ).toPandas()
    key = ["lang", "doc_id"]
    assert sorted(map(tuple, on[key].values)) == sorted(map(tuple, off[key].values))
    g = on.groupby("lang")["n_chars"].sum()
    # every group reaches the budget and overshoots by less than one doc
    assert (g >= 1500).all() and (g < 1500 + 420).all()
    # budget larger than any group's total: everything selected
    full = sample.token_budget_sample(corpus, 10**9, "n_chars", "lang").toPandas()
    assert len(full) == 600


def test_incremental_dedup_matches_oneshot(spark, tmp_path):
    """Three id-ordered batches through a persisted store (REOPENED from
    disk between batches) decide identically to a one-shot pass; the
    id-order contract raises."""
    from pyspark.sql import functions as F

    from pyhydroqc_spark.textops import dedup, incremental

    rows = []
    for i in range(90):
        words = [f"w{(7 * i + j * j) % 53}" for j in range(30)]
        if i % 9 == 4:  # near-dup of i-1: one word changed
            words = [f"w{(7 * (i - 1) + j * j) % 53}" for j in range(30)]
            words[0] = "CHANGED"
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    sig = dedup.minhash_signatures(docs, num_perm=32)
    cand = dedup.minhash_candidates(sig, bands=8)
    ver = (
        cand.join(sig.select(F.col("id").alias("id_a"), F.col("signature").alias("sa")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("signature").alias("sb")), "id_b")
        .where(
            F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v))
            / 32.0
            >= 0.5
        )
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    oneshot = sorted(
        tuple(r)
        for r in sig.select("id")
        .join(ver.withColumnRenamed("id_b", "id"), "id", "left")
        .select("id", F.col("dup_of").isNull().alias("keep"), "dup_of")
        .collect()
    )
    assert any(not r[1] for r in oneshot)  # planted dups really drop

    root = str(tmp_path / "store")
    got = []
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        store = incremental.DedupStore(root)  # reopen: state is on disk
        d = incremental.incremental_dedup(
            docs.where(f"doc_id >= {lo} AND doc_id < {hi}"), store
        )
        got.extend(tuple(r) for r in d.collect())
    assert sorted(got) == oneshot
    with pytest.raises(ValueError, match="id-ordered"):
        incremental.incremental_dedup(docs.where("doc_id < 5"), incremental.DedupStore(root))


def test_dedup_stream_replay_safe(spark, tmp_path):
    """dedup_stream drains landing files == one-shot decisions; a replayed
    partially-committed batch (orphan bucket rows, no signatures) decides
    identically and overwrites, never duplicates."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from pyhydroqc_spark.tables import SnapshotTable
    from pyhydroqc_spark.textops import dedup, incremental

    rows = []
    for i in range(60):
        words = [f"w{(7 * i + j * j) % 53}" for j in range(30)]
        if i % 9 == 4:
            words = [f"w{(7 * (i - 1) + j * j) % 53}" for j in range(30)]
            words[0] = "X"
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    for k, (lo, hi) in enumerate([(0, 30), (30, 60)]):
        docs.where(f"doc_id>={lo} and doc_id<{hi}").coalesce(1).write.parquet(
            f"{land}/stage{k}"
        )
    import os

    os.makedirs(f"{land}/all")
    for k in range(2):
        for p in glob.glob(f"{land}/stage{k}/*.parquet"):
            shutil.copy(p, f"{land}/all/batch{k}.parquet")

    incremental.dedup_stream(spark, f"{land}/all", out)
    got = sorted(
        tuple(r) for r in SnapshotTable(f"{out}/decisions").read(spark).collect()
    )

    sig = dedup.minhash_signatures(docs, num_perm=32)
    cand = dedup.minhash_candidates(sig, bands=8)
    ver = (
        cand.join(sig.select(F.col("id").alias("id_a"), F.col("signature").alias("sa")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("signature").alias("sb")), "id_b")
        .where(
            F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v))
            / 32.0
            >= 0.5
        )
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    oneshot = sorted(
        tuple(r)
        for r in sig.select("id")
        .join(ver.withColumnRenamed("id_b", "id"), "id", "left")
        .select("id", F.col("dup_of").isNull().alias("keep"), "dup_of")
        .collect()
    )
    assert got == oneshot

    # partial-commit replay: write ONLY the bucket rows of a new batch
    # (the crash window), then decide the same batch again — identical
    store = incremental.DedupStore(f"{out}/store")
    extra = spark.createDataFrame(
        pd.DataFrame([(i, rows[i - 40][1]) for i in range(60, 70)],
                     columns=["doc_id", "text"])
    )
    d1, s1, b1, _ = incremental._decide(
        extra, store, 0.5, 32, 8, 5, "xxhash64", "doc_id", "text", True
    )
    first = sorted(tuple(r) for r in d1.collect())
    store.buckets.overwrite_partition(b1, "b_crash")
    s1.unpersist()
    d2, s2, _, _ = incremental._decide(
        extra, store, 0.5, 32, 8, 5, "xxhash64", "doc_id", "text", True
    )
    assert sorted(tuple(r) for r in d2.collect()) == first
    s2.unpersist()


def test_curate_stack_reasons(spark):
    """curate(): one call through scrub -> C4 -> span-strip -> gopher ->
    decontam -> near-dup; every drop carries its diagnosis and the
    rewritten text is PII-redacted."""
    from pyhydroqc_spark.textops import curate

    sent = "the quick brown fox jumps over the lazy dog and that is fine."
    mk = lambda n: "\n".join(
        f"{sent} number {i} of this very ordinary document text." for i in range(n)
    )
    # the benchmark uses ITS OWN long sentence so only doc 4 shares a
    # 13-gram with it (every mk() doc contains 13-grams of `sent` itself)
    bsent = (
        "when the river rises above the old stone bridge the village "
        "bells ring out across the quiet valley for everyone to hear."
    )
    bench_text = "\n".join(f"{bsent} entry {i} follows here." for i in range(8))
    rows = [
        (0, mk(10) + "\nwrite to alice@example.org with your answer please."),
        (1, mk(12)),
        (2, mk(12)),                       # exact dup of 1 after cleaning
        (3, "lorem ipsum dolor sit amet.\n" + mk(9)),   # C4 page drop
        (4, bench_text),                   # contaminated vs bench
        (5, "short doc."),                 # gopher word_count
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    bench = spark.createDataFrame(
        pd.DataFrame([(99, bench_text)], columns=["doc_id", "text"])
    )
    out = curate.curate(
        docs,
        bench_df=bench,
        gopher_kwargs={"min_words": 30, "min_avg_word_len": 2.0,
                       "max_top2gram_frac": 1.0, "max_dup5gram_frac": 1.0},
        strip_spans=False,  # the repeated sentence IS the content here
        near_dup="exact",
    ).toPandas().set_index("id").sort_index()

    assert "<PII_EMAIL>" in out.loc[0, "text"] and "alice@" not in out.loc[0, "text"]
    # the identical doc dies EARLIER than the dedup stage: C4's corpus-
    # level keep-one line dedup strips every line doc 2 shares with doc 1
    # (stage interplay, not a bug) — doc 1 survives, doc 2 does not
    assert bool(out.loc[1, "keep"]) and not bool(out.loc[2, "keep"])
    assert "c4_page" in list(out.loc[3, "reasons"])
    assert "contaminated" in list(out.loc[4, "reasons"])
    assert "gopher:word_count" in list(out.loc[5, "reasons"])
    assert bool(out.loc[0, "keep"])

    rep = {r["reason"]: r["n_docs"] for r in curate.drop_report(
        curate.curate(docs, bench_df=bench, near_dup="exact")
    ).collect()}
    assert rep.get("c4_page", 0) >= 1

    # the near-dup reason path, isolated from C4's line dedup
    mini = spark.createDataFrame(
        pd.DataFrame([(10, mk(6)), (11, mk(6)), (12, bench_text)],
                     columns=["doc_id", "text"])
    )
    nd = curate.curate(
        mini, c4=False, strip_spans=False, gopher=False, near_dup="exact"
    ).toPandas().set_index("id").sort_index()
    assert bool(nd.loc[10, "keep"]) and not bool(nd.loc[11, "keep"])
    assert list(nd.loc[11, "reasons"]) == ["near_dup"]
    assert bool(nd.loc[12, "keep"])
