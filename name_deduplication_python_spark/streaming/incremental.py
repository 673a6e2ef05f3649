"""Incremental (streaming) dedup: new pages arrive, match vs the corpus.

The reference is strictly batch (SURVEY §2.10) — this is the engine
extension a continuously-crawled corpus needs: a Structured Streaming job
that, per micro-batch of new pages,

  1. extracts + signs the new pages (same kernels as batch — identical
     signatures by construction),
  2. LSH-joins the batch's band keys against the accumulated signature
     store (new-vs-old two-table join, J3 analog, plus new-vs-new
     self-join),
  3. verifies and appends edges, then appends the new signatures to the
     store (exactly-once per epoch via idempotent epoch subdirs).

foreachBatch is the right tool (not a stateful operator): the signature
store is too large for stream state and must live in the lake; each
micro-batch is a bounded batch job against it. Checkpointing comes from
the streaming checkpoint dir + the store's epoch layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import DEFAULT_CONFIG
from ..operators.extract import extract_stage
from ..operators.lsh import band_keys, candidate_pairs, candidate_pairs_two_table
from ..operators.signatures import signature_stage
from ..operators.verify import verify_stage
from ..schemas import WEB_PAGES


class IncrementalDedup:
    def __init__(self, spark: SparkSession, store_dir: str, config: dict | None = None):
        self.spark = spark
        self.store = store_dir
        self.cfg = dict(DEFAULT_CONFIG, **(config or {}))
        os.makedirs(os.path.join(store_dir, "signatures"), exist_ok=True)
        os.makedirs(os.path.join(store_dir, "band_keys"), exist_ok=True)
        os.makedirs(os.path.join(store_dir, "edges"), exist_ok=True)

    @staticmethod
    def _pruned_store_sigs(old_sigs: DataFrame, pairs: DataFrame) -> DataFrame:
        """Store signatures restricted to docs appearing in this epoch's
        candidate pairs. Cross pairs carry store docs on the dst side only
        (candidate_pairs_two_table puts new on src), but the semi-join is
        run over BOTH sides so the pruning stays correct if a caller feeds
        symmetric pairs; ids are 8-byte keys, payloads shuffle only for
        touched docs. Round-2 shipped the WHOLE store's 512 B payloads into
        the verify join every micro-batch — O(corpus) per epoch."""
        touched = (
            pairs.select(F.col("src").alias("url"))
            .union(pairs.select(F.col("dst").alias("url")))
            .distinct()
        )
        return old_sigs.join(touched, "url", "left_semi").drop("epoch")

    def _read_store(self, sub: str) -> DataFrame | None:
        path = os.path.join(self.store, sub)
        try:
            df = self.spark.read.parquet(path)
            return df if len(df.columns) else None
        except Exception:
            return None

    def process_batch(self, pages: DataFrame, epoch_id: int) -> None:
        """foreachBatch body — also callable directly for unit tests.

        Band keys are PERSISTED per epoch (store/band_keys/epoch=N) and
        the new batch's keys join directly against the stored key table.
        Round-1 recomputed band_keys over the ENTIRE accumulated signature
        store every micro-batch — a 25x explode + window shuffle of the
        whole corpus per epoch. Now historical epochs are written once and
        only scanned (columnar, 3 narrow columns); per-epoch compute is
        O(batch + matched buckets).

        Replay exactness: all store reads are filtered to ``epoch <
        epoch_id``. A crash after the band_keys/epoch=N write but before
        the signatures write (the idempotence marker) leaves partial
        epoch-N files in the store; an unfiltered replay of epoch N would
        read its OWN keys back and cross-join the batch against itself
        (self-edges + duplicated intra-batch pairs). The filter makes the
        replay read exactly what the first attempt read.

        Verify-side pruning: the store's 512 B minhash payloads are pulled
        ONLY for docs that actually appear in this epoch's candidate pairs
        (a semi-join on the 8-byte ids) — per-epoch shuffle cost is
        O(batch + touched docs), not O(corpus). See _pruned_store_sigs.
        """
        c = self.cfg
        sig_epoch = os.path.join(self.store, "signatures", f"epoch={epoch_id}")
        if os.path.exists(os.path.join(sig_epoch, "_SUCCESS")):
            return  # epoch replayed after restart: already applied
        extracted = extract_stage(pages)
        new_sigs = signature_stage(
            extracted,
            num_hashes=c["num_hashes"],
            shingle_k=c["shingle_k"],
            seed=c["seed"],
        ).localCheckpoint()
        # reused three ways (self-join, store cross-join, persistence)
        new_keys = band_keys(
            new_sigs, bands=c["bands"], rows_per_band=c["rows_per_band"]
        ).localCheckpoint()

        # new-vs-new self-join
        pairs, _ = candidate_pairs(new_keys, bucket_cap=c["bucket_cap"], with_stats=False)
        all_sigs = new_sigs
        old_keys = self._read_store("band_keys")
        if old_keys is not None:
            old_keys = old_keys.where(F.col("epoch") < epoch_id)
            cross = candidate_pairs_two_table(new_keys, old_keys)
            pairs = pairs.unionByName(cross).distinct()
            # pairs are reused twice (touched-id semi-join + verify) and are
            # O(batch): checkpoint so the candidate join runs once
            pairs = pairs.localCheckpoint()
            old_sigs = self._read_store("signatures").where(
                F.col("epoch") < epoch_id
            )
            all_sigs = new_sigs.unionByName(
                self._pruned_store_sigs(old_sigs, pairs)
            )

        edges = verify_stage(
            pairs,
            all_sigs,
            num_hashes=c["num_hashes"],
            jaccard_threshold=c["jaccard_threshold"],
            simhash_radius=c["simhash_radius"],
        )
        edges.write.mode("overwrite").parquet(
            os.path.join(self.store, "edges", f"epoch={epoch_id}")
        )
        new_keys.write.mode("overwrite").parquet(
            os.path.join(self.store, "band_keys", f"epoch={epoch_id}")
        )
        # signatures written LAST: their _SUCCESS is the epoch's idempotence
        # marker, so a crash mid-epoch replays the whole epoch (overwrite
        # mode makes the replay exact)
        new_sigs.write.mode("overwrite").parquet(sig_epoch)

    def start(self, source_dir: str, checkpoint_dir: str, available_now: bool = True):
        """File-source stream of web_pages parquet -> incremental dedup."""
        stream = (
            self.spark.readStream.schema(WEB_PAGES)
            .option("maxFilesPerTrigger", "8")
            .parquet(source_dir)
        )
        writer = stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def edges(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.store, "edges"))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a (streaming or batch)
    events DataFrame — late data beyond the watermark is dropped in
    streaming mode; in batch mode the same plan is a plain window agg
    (mirrors plans/queries.q_events_windowed)."""
    # watermarks require TIMESTAMP (LTZ); parquet NTZ is cast (UTC session)
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
