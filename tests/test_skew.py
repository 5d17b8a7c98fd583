"""Hot-source skew defusal (north_rule: "per-series sequences are salted
and repartitioned to defuse hot-source skew"). The synthetic generator puts
~half of all series on one source; partitioning by source would stall the
job on one straggler partition, hash-spreading by doc_id must not."""

import numpy as np
from pyspark.sql import functions as F

from pyhydroqc_spark.datagen import gen_token_table
from pyhydroqc_spark.ingest import repartition_series

TOK_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _partition_sizes(df):
    return (
        df.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .count()
        .toPandas()["count"]
        .to_numpy()
    )


def test_repartition_series_defuses_hot_source(spark):
    pdf = gen_token_table(n_series=64, n_tok=200, seed=3)  # skew=True: src0 ~50%
    hot_frac = (pdf["source"] == "src0").mean()
    assert hot_frac > 0.4  # the generator really is skewed

    tok = spark.createDataFrame(pdf, TOK_SCHEMA)
    n = 8

    # the anti-pattern: source-keyed partitioning concentrates the hot key
    by_source = _partition_sizes(tok.repartition(n, "source"))
    assert by_source.max() >= 0.4 * len(pdf)

    # the engine's axis: doc_id hash-spread — near-uniform
    by_series = _partition_sizes(repartition_series(tok, n))
    assert len(by_series) == n or by_series.max() <= 2 * np.ceil(len(pdf) / n)
    assert by_series.max() <= 2 * np.ceil(len(pdf) / n)
