"""Extraction stage: web_pages -> extracted (url, warc_ts, text, lang).

Analog of the reference's one-time per-row normalization pass
(_precompute_dataframe, /root/reference/analysis_engine.py:90-106):
derive the canonical text ONCE before any pairwise work. Vectorized
pandas UDF over Arrow batches — no per-row Python (input_hint mandate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.text_extract import extract_series


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_series(html)


def extract_stage(pages: DataFrame) -> DataFrame:
    """Fill missing ``text`` from ``html`` (byte-deterministic spec).

    Rows that already carry text keep it verbatim; the skipped-UDF branch
    is a native ``when`` so Catalyst prunes the html column read for
    partitions where text is fully populated only at runtime (AQE), and
    the UDF runs on Arrow batches.
    """
    return pages.select(
        "url",
        "warc_ts",
        F.when(F.col("text").isNotNull(), F.col("text"))
        .otherwise(extract_text_udf(F.col("html")))
        .alias("text"),
        "lang",
    )
