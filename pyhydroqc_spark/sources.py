"""Sources & sinks — LRO-shaped CSV ingest, calibration-dates dims, exports.

Re-expression of the reference's data access (`/root/reference/pyhydroqc/
anomaly_utilities.py:20-73` ``get_data``) on Spark readers, so a user of
the reference can point the engine at the same site-year CSV files:

* ``load_sensor_csv`` — S1 (CSV scan + datetime parse) + S2 (multi-file
  union along the time axis) + S3 (per-sensor projection into
  raw / cor / labeled_anomaly), returning ONE long DataFrame keyed
  ``doc_id = <site>:<sensor>`` instead of the reference's dict of pandas
  frames — the dict loop becomes the partitioning axis.
* ``load_calib_dates`` — S4: the tiny (start, end, gap) dimension
  (`Examples/FindCompareGaps.py:45-48`), broadcast-join ready.
* ``write_table`` — S5: parquet/snapshot-table sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

NO_DATA = -9999.0


def load_sensor_csv(
    spark: SparkSession,
    paths: list[str],
    sensors: list[str],
    site: str = "site",
) -> DataFrame:
    """Site-year CSVs → long QC-ready frame.

    Output schema: (doc_id, source, sensor, ts, pos, raw, cor,
    labeled_anomaly). ``cor``/``labeled_anomaly`` are NULL/False when the
    file carries no ``<sensor>_cor`` / ``<sensor>_qual`` columns —
    mirroring the reference's conditional projection
    (`anomaly_utilities.py:66-70`; label = qual non-null at :70).
    """
    raw = (
        spark.read.option("header", True)
        .option("ignoreLeadingWhiteSpace", True)
        .option("nullValue", "NULL")
        .csv(list(paths))
    )
    ts_col = raw.columns[0]
    out = raw.withColumn("ts", F.to_timestamp(F.col(ts_col)))
    frames = []
    for snsr in sensors:
        if snsr not in raw.columns:
            continue
        cor = (
            F.col(f"{snsr}_cor").try_cast("double")
            if f"{snsr}_cor" in raw.columns
            else F.lit(None).cast("double")
        )
        lab = (
            F.col(f"{snsr}_qual").isNotNull()
            if f"{snsr}_qual" in raw.columns
            else F.lit(False)
        )
        frames.append(
            out.select(
                F.lit(f"{site}:{snsr}").alias("doc_id"),
                F.lit(site).alias("source"),
                F.lit(snsr).alias("sensor"),
                "ts",
                F.col(snsr).try_cast("double").alias("raw"),
                cor.alias("cor"),
                lab.alias("labeled_anomaly"),
            )
        )
    if not frames:
        raise ValueError(f"none of {sensors} present in {paths}")
    from functools import reduce

    united = reduce(lambda a, b: a.unionByName(b), frames)
    w = Window.partitionBy("doc_id").orderBy("ts")
    return united.withColumn("pos", F.row_number().over(w) - 1)


def load_calib_dates(spark: SparkSession, path: str) -> DataFrame:
    """(start, end, gap) calibration-event dimension.

    The real reference fixtures (`LRO_data/MainStreet_{ph,do,cond}_calib_dates.csv`)
    carry a UTF-8 BOM, a title line (``pH,,``) BEFORE the ``start,end,gap``
    header, and CRLF line endings — the reference reads them with
    ``pd.read_csv(header=1)`` (`Examples/FindCompareGaps.py:45-48`). Parsing
    via ``text`` + ``from_csv`` and keeping only rows whose first two fields
    parse as timestamps is robust to any number of leading title lines.

    DOCUMENTED DEVIATION: rows whose start/end fail ``try_to_timestamp``
    are DROPPED, whereas the reference's ``pd.read_csv + to_datetime``
    keeps them as NaT (and downstream range joins then silently skip
    them). Dropping is the safer contract for a dimension that feeds range
    joins — an event with no parseable bounds can never match — but
    callers diffing row counts against the reference on malformed fixtures
    should know the counts diverge there (the real MainStreet files parse
    cleanly, so both behaviors agree on them).
    """
    schema = "`start` STRING, `end` STRING, `gap` STRING"
    clean = F.regexp_replace(
        F.regexp_replace(F.col("value"), "^\\ufeff", ""), "\r+$", ""
    )
    parsed = (
        spark.read.text(path)
        .select(F.from_csv(clean, schema).alias("r"))
        .select(
            F.try_to_timestamp("r.start").alias("start"),
            F.try_to_timestamp("r.end").alias("end"),
            F.col("r.gap").try_cast("double").alias("gap"),
        )
    )
    return parsed.where(F.col("start").isNotNull() & F.col("end").isNotNull())


def write_table(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
