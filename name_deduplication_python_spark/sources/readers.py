"""Tolerant table readers (SURVEY §2.1 S1/S2, §2.2 P4).

The reference loads user files with permissive pandas CSV parsing, all
columns as strings, dropping all-null rows
(/root/reference/main.py:634-640). Spark equivalents below; Excel (S2)
has no JVM reader in this container and raises a documented error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(
    spark: SparkSession,
    path: str,
    sep: str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV/TSV/TXT/parquet scan, string-typed, PERMISSIVE, all-null rows
    dropped (S1 + P4). sep inferred from extension when not given."""
    lower = path.lower()
    if lower.endswith(".parquet"):
        return spark.read.parquet(path)
    if lower.endswith((".xlsx", ".xls")):
        raise NotImplementedError(
            "Excel scan (SURVEY S2) needs the spark-excel connector or a "
            "pre-conversion step; not available in this container"
        )
    if sep is None:
        sep = "\t" if lower.endswith((".tsv", ".txt")) else ","
    df = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path, sep=sep, inferSchema=False)
    )
    return df.na.drop("all")


def with_row_provenance(df: DataFrame, source: str) -> DataFrame:
    """C14 analog done right: typed (source, row_id) lineage columns
    instead of the reference's 'userfile {idx+2}' strings
    (/root/reference/analysis_engine.py:601)."""
    return df.select(
        F.lit(source).alias("src_table"),
        F.monotonically_increasing_id().alias("src_row_id"),
        "*",
    )
