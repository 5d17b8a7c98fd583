"""Streaming incremental rollups: AvailableNow drain + cell merge equals the
one-shot batch rollup; resumes from checkpoint without double counting."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyhydroqc_spark import streaming
from pyhydroqc_spark.datagen import gen_token_table
from pyhydroqc_spark.ingest import explode_tokens
from pyhydroqc_spark.operators.rollup import rollup_points


def _tok_schema():
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )
    return StructType([
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ])


def test_streaming_rollup_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    pdf = gen_token_table(n_series=4, n_tok=800, seed=1)
    first, second = pdf.iloc[:2], pdf.iloc[2:]
    spark.createDataFrame(first, schema=_tok_schema()).write.mode("append").parquet(in_dir)

    streaming.run_streaming_rollup(spark, in_dir, out_dir)
    agg1 = spark.read.parquet(os.path.join(out_dir, "agg"))
    assert set(r["doc_id"] for r in agg1.select("doc_id").distinct().collect()) == set(
        first["doc_id"]
    )

    # second batch of files lands; rerun drains ONLY the new ones
    spark.createDataFrame(second, schema=_tok_schema()).write.mode("append").parquet(in_dir)
    streaming.run_streaming_rollup(spark, in_dir, out_dir)
    agg2 = (
        spark.read.parquet(os.path.join(out_dir, "agg"))
        .orderBy("doc_id", "bucket_start")
        .toPandas()
    )

    # oracle: one-shot batch rollup over everything
    full = spark.createDataFrame(pdf, schema=_tok_schema())
    exp = (
        rollup_points(explode_tokens(full), 900, value_col="value")
        .orderBy("doc_id", "bucket_start")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        agg2.reset_index(drop=True)[exp.columns], exp.reset_index(drop=True),
        check_dtype=False,
    )
