import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyhydroqc_spark.session import get_spark

    s = get_spark("pyhydroqc-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def token_pdf():
    from pyhydroqc_spark.datagen import gen_token_table

    return gen_token_table(n_series=6, n_tok=1200, seed=42)


@pytest.fixture(scope="session")
def long_df(spark, token_pdf):
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from pyhydroqc_spark.ingest import explode_tokens

    schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("tokens", ArrayType(IntegerType(), False), False),
            StructField("n_tok", IntegerType(), False),
            StructField("source", StringType(), False),
        ]
    )
    df = spark.createDataFrame(token_pdf, schema=schema)
    return explode_tokens(df).cache()
