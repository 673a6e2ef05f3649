"""Line-level (CCNet-style) corpus dedup: strip lines repeated across
documents.

Web boilerplate (navigation, cookie banners, footers) recurs VERBATIM as
whole lines across many pages; the standard training-data cleanup (CCNet,
Wenzek et al. 2020; RefinedWeb — both public) drops every line whose
exact text occurs in >= ``min_docs`` distinct documents, keeping the
surviving lines in original order. This complements document-level dedup
(operators/lsh.py et al.): those merge near-identical PAGES, this removes
repeated SPANS inside otherwise-unique pages.

Spark-first shape — no UDF anywhere:
  1. posexplode(split(text, '\\n'))       -> (url, pos, line)
  2. repeated lines = groupBy(line_hash) counting DISTINCT docs, kept as
     an 8-byte-key table (xxhash64(line) — the line string itself never
     enters the shuffle twice); only hashes with >= min_docs docs survive
     the aggregate (the overwhelmingly-singleton majority dies map-side
     combined, the exact analog of the LSH singleton prefilter)
  3. left-anti join lines against the repeated-hash table (8-byte keys)
  4. re-assemble: groupBy(url) sort_array over (pos, line) structs ->
     concat_ws('\\n') — original order restored without a window sort.

At 10^12 docs the repeated-hash table is small relative to the corpus
(boilerplate is heavy-tailed), and step 2/3 join on 8-byte keys; the only
wide shuffle is the unavoidable line explode. Blank lines are never
counted as boilerplate AND never removed — paragraph boundaries in
untouched documents survive byte-for-byte (tested).

Hash note: dropping a line on an xxhash64 collision with true boilerplate
has odds |lines|^2/2^64 per corpus — the same documented budget as the
pipeline's other 64-bit surrogates; pass ``exact=True`` to key the
aggregate/join on the line text itself (wider shuffle, zero collisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repeated_lines(
    pages: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    min_docs: int = 2,
    exact: bool = False,
) -> DataFrame:
    """The boilerplate-line table: (line_key, n_docs, n_occurrences) for
    every line appearing in >= min_docs distinct documents. line_key is
    xxhash64(line) (or the line text when exact=True)."""
    lines = pages.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).where(F.trim("line") != "")
    key = F.col("line") if exact else F.xxhash64("line")
    return (
        lines.select(id_col, key.alias("line_key"))
        .groupBy("line_key")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def dedup_lines(
    pages: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    min_docs: int = 2,
    exact: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """pages -> pages with ``text`` (or ``out_col``) rewritten to only the
    lines NOT repeated across >= min_docs documents, original line order
    preserved. Rows whose every line was boilerplate keep an empty string
    (they are then dropped by the extract/signature empty-text rules)."""
    out_col = out_col or text_col
    rep = repeated_lines(
        pages, id_col=id_col, text_col=text_col, min_docs=min_docs, exact=exact
    ).select("line_key")
    # NOTE no blank-line filter here: blank lines are excluded from the
    # repeated-lines TABLE (so they are never "boilerplate") but kept in
    # the document stream, preserving paragraph boundaries of documents
    # the operator does not touch.
    lines = pages.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    key = F.col("line") if exact else F.xxhash64("line")
    kept = lines.withColumn("line_key", key).join(rep, "line_key", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("pos"), F.col("line")))
                    ),
                    lambda s: s["line"],
                ),
            ).alias("_deduped")
        )
    )
    others = [c for c in pages.columns if c != out_col]
    return (
        pages.join(rebuilt, id_col, "left")
        .select(
            *others,
            F.coalesce("_deduped", F.lit("")).alias(out_col),
        )
    )
