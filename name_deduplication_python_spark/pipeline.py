"""End-to-end dedup pipeline with checkpointed, idempotently-resumable
stages and per-partition lineage.

The reference is one monolithic in-memory run — a crash loses everything
(/root/reference/main.py:546-683, SURVEY §4.2 'no incremental/resume').
Here every stage materializes to parquet under a work dir; re-running the
pipeline skips stages whose output already exists (atomic via Spark's
_SUCCESS marker), so any stage resumes idempotently (north_rule). Each
stage also appends a lineage/metrics row set: (stage, partition_id,
n_rows) plus stage wall-clock, written to <workdir>/metrics.

Stages:
  1 extracted   url, warc_ts, text, lang         (byte-deterministic)
  2 signatures  url, minhash[128], simhash, n_shingles
  2b exact_map  url, rep   (identical-signature collapse; rep = group min
                url — LSH then runs on reps only; exact_collapse=True)
  3 pairs       src, dst (surrogate uid = xxhash64(url); 8-byte shuffle
                keys — see run() comment)                (LSH candidates)
  4 edges       src, dst (urls), est_jaccard, hamming, status (verified)
  5 clusters    url, cluster_id                  (CC over edges, min-url label)

On a real cluster the work dir is an object-store path and the tables
are Iceberg; parquet-dir + _SUCCESS is the same contract the sandbox can
exercise.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import DEFAULT_CONFIG
from .operators.components import (
    components_with_exact_map,
    components_with_singletons,
)
from .operators.extract import extract_stage
from .operators.lsh import band_keys, candidate_pairs
from .operators.signatures import signature_stage
from .operators.verify import verify_stage


@dataclass
class DedupConfig:
    shingle_k: int = DEFAULT_CONFIG["shingle_k"]
    num_hashes: int = DEFAULT_CONFIG["num_hashes"]
    bands: int = DEFAULT_CONFIG["bands"]
    rows_per_band: int = DEFAULT_CONFIG["rows_per_band"]
    simhash_radius: int = DEFAULT_CONFIG["simhash_radius"]
    jaccard_threshold: float = DEFAULT_CONFIG["jaccard_threshold"]
    bucket_cap: int = DEFAULT_CONFIG["bucket_cap"]
    seed: int = DEFAULT_CONFIG["seed"]
    # hamming_est_floor (precision tier, VERDICT r4 #1): None keeps the
    # north-star OR semantics (Hamming<=radius admits regardless of the
    # MinHash estimate); a float requires hamming-only edges to also show
    # est_jaccard >= floor. operators.verify.hamming_floor() returns the
    # recommended strict value (theta - 2*z*sigma ~ 0.635): measured on
    # planted families it cuts the near-J~0.5 false-merge rate from
    # 0.11-0.22 to ~0 while leaving J>=0.8 recall intact (gate-tested).
    # Every edge carries a `via` tier column under BOTH settings.
    hamming_est_floor: float | None = None
    # connected-components crossovers (VERDICT r4 #5) — measured defaults
    # from operators/components.py docstrings; fingerprinted so retuning
    # never silently reuses checkpoints. On a real cluster: lower
    # cc_small_graph_threshold to what one executor labels quickly
    # (~16 B/edge through a single task), raise cc_broadcast_edge_threshold
    # with executor memory (~64 B/edge of broadcast table).
    cc_small_graph_threshold: int = 10_000_000
    cc_string_hash_threshold: int = 200_000
    cc_broadcast_edge_threshold: int = 1_500_000
    # fuse_stages trades resume granularity for wall-clock: the five-stage
    # layout becomes three jobs (extract fused into signatures; the pair
    # explosion fused into the verify join), removing two full
    # materialize+rescan round-trips and their job-commit barriers. The
    # checkpoint/recompute tradeoff is the standard lakehouse knob; results
    # are identical (same kernels, same plans past the fusion point).
    fuse_stages: bool = False
    # exact_collapse: identical-signature docs collapse to one
    # representative before the band shuffle (operators.signatures.
    # signature_collapse) — structurally prevents exact-dup mega-buckets
    # and cuts LSH work by the corpus dup rate; clusters are identical
    # (rep = group min id; parity-tested).
    exact_collapse: bool = True
    # table_format: the stage-table storage format — 'parquet' (default;
    # plain dirs + _SUCCESS markers, what the sandbox exercises) or
    # 'iceberg' (north_star's 'Iceberg-style tables': path-based Iceberg
    # tables via the iceberg-spark runtime jars; same layout, snapshot
    # commits instead of _SUCCESS). Every stage write/read goes through
    # _write_stage/_read_stage, so the format is a config flip, not a
    # rewrite; without the runtime jars the 'iceberg' branch raises a
    # clear error at first write.
    table_format: str = "parquet"
    # collapse_hash_bits: width of the signature-collapse content hash
    # (operators.signatures.signature_collapse): 64 (one xxhash64 — fine
    # to ~10^9 docs, collision odds n^2/2^65) or 128 (two seeded xxhash64
    # columns — the 10^12-doc setting; heuristically ~n^2/2^129, see the
    # signature_collapse docstring for the honest caveat on seed-variant
    # independence). Clusters are identical under both widths
    # (parity-tested); the knob is part of the config fingerprint so a
    # width change never reuses checkpoints.
    collapse_hash_bits: int = 64
    extra: dict = field(default_factory=dict)


def _done(path: str, table_format: str = "parquet") -> bool:
    """Stage-complete probe. Parquet stages commit atomically via Spark's
    _SUCCESS marker; an Iceberg table's commit marker is its metadata
    version file (snapshot commit — the same atomicity contract)."""
    if table_format == "iceberg":
        return os.path.exists(os.path.join(path, "metadata", "version-hint.text"))
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def allocate_run_dir(base: str, cfg: "DedupConfig | None" = None) -> str:
    """S10 analog (output path allocator, /root/reference/main.py's
    report-path scheme re-imagined for a lake layout): allocate a run
    directory under ``base`` keyed by the CONFIG FINGERPRINT, so

      * the same config always resumes the same run dir (checkpoint
        reuse comes for free, and the fingerprint check can never refuse);
      * a changed config allocates a SIBLING dir instead of clobbering or
        refusing — no stale-checkpoint hazard;
      * a dir whose config.json somehow mismatches its name (manual
        tampering) falls through to a numbered sibling rather than
        colliding.
    """
    import hashlib
    from dataclasses import asdict

    cfg = cfg or DedupConfig()
    fp = {k: v for k, v in asdict(cfg).items() if k != "extra"}
    blob = json.dumps(fp, sort_keys=True).encode()
    tag = hashlib.sha256(blob).hexdigest()[:12]
    for seq in range(1000):
        path = os.path.join(base, f"run-{tag}" + (f"-{seq}" if seq else ""))
        cfg_path = os.path.join(path, "config.json")
        if not os.path.exists(path):
            os.makedirs(path, exist_ok=True)
            return path
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                if json.load(f) == fp:
                    return path  # same config: resume here
        else:
            return path  # allocated but unfingerprinted: claim it
    raise RuntimeError(f"could not allocate a run dir under {base}")


def _lineage_rows(path: str, stage: str) -> list[dict]:
    """Per-partition lineage rows (stage, partition_id, n_rows, file) read
    from the parquet footers of the just-written stage output — no Spark
    job (the old groupBy(spark_partition_id) cost one full scan per stage,
    pure fixed overhead in the job's critical path)."""
    import pyarrow.parquet as pq

    rows = []
    # parquet stages only — iceberg stages use _lineage_rows_iceberg (the
    # committed snapshot's file list; a footer walk over data/ would count
    # orphaned pre-commit files)
    part_files = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
    for i, name in enumerate(part_files):  # ids contiguous from 0 (no _SUCCESS/.crc gaps)
        meta = pq.read_metadata(os.path.join(path, name))
        rows.append(
            {
                "stage": stage,
                "partition_id": i,
                "n_rows": meta.num_rows,
                "file": name,
            }
        )
    return rows


class DedupPipeline:
    """Resumable near-dup pipeline over a web_pages DataFrame."""

    STAGES = ("extracted", "signatures", "exact_map", "pairs", "edges", "clusters")

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        config: DedupConfig | None = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.cfg = config or DedupConfig()
        self.stage_seconds: dict[str, float] = {}
        os.makedirs(workdir, exist_ok=True)
        self._check_config_fingerprint()

    def _check_config_fingerprint(self) -> None:
        """Stage resume keys on _SUCCESS markers; a different DedupConfig
        in the same workdir would silently reuse checkpoints computed
        under the old config — refuse instead (caller picks a new workdir
        or deletes the stale one)."""
        from dataclasses import asdict

        fp_path = os.path.join(self.workdir, "config.json")
        fp = {k: v for k, v in asdict(self.cfg).items() if k != "extra"}
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                existing = json.load(f)
            if existing != fp:
                raise ValueError(
                    f"workdir {self.workdir} holds checkpoints for a "
                    f"different DedupConfig ({existing} != {fp}); use a new "
                    "workdir or delete the stale one"
                )
        else:
            with open(fp_path, "w") as f:
                json.dump(fp, f)

    def _path(self, stage: str) -> str:
        if self.cfg.table_format == "iceberg":
            # hadoop-catalog layout: warehouse/<namespace>/<table>
            return os.path.join(self.workdir, "stages", stage)
        return os.path.join(self.workdir, stage)

    def _stage_done(self, stage: str) -> bool:
        return _done(self._path(stage), self.cfg.table_format)

    # catalog name is derived from the workdir so two pipelines with
    # different workdirs in one session never share a warehouse setting
    def _iceberg_catalog(self) -> str:
        import hashlib

        tag = hashlib.sha256(self.workdir.encode()).hexdigest()[:10]
        name = f"ndps_hadoop_{tag}"
        conf = self.spark.conf
        if conf.get(f"spark.sql.catalog.{name}", None) is None:
            conf.set(
                f"spark.sql.catalog.{name}", "org.apache.iceberg.spark.SparkCatalog"
            )
            conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
            conf.set(f"spark.sql.catalog.{name}.warehouse", self.workdir)
        return name

    def _iceberg_table(self, stage: str) -> str:
        return f"{self._iceberg_catalog()}.stages.{stage}"

    def _write_stage(self, df: DataFrame, stage: str) -> None:
        """THE format dispatch point: every stage table is written here
        and read via _read_stage, so the north_star's 'Iceberg-style
        tables' is a DedupConfig flip (table_format='iceberg'), not a
        rewrite. The iceberg branch writes through a per-workdir HADOOP
        catalog (warehouse = workdir; table stages.<stage> lands at
        workdir/stages/<stage> — same layout, snapshot-commit atomicity)
        with the V2 writer, whose createOrReplace CREATES the table on
        first write (the V1 path-based writer cannot, ADVICE r4). Needs
        the iceberg-spark runtime jar (spark.jars.packages=
        org.apache.iceberg:iceberg-spark-runtime-<spark>_<scala>:<ver>);
        only missing-jar/catalog-plugin errors are rewrapped with that
        hint — real Iceberg errors re-raise unchanged."""
        if self.cfg.table_format == "iceberg":
            try:
                df.writeTo(self._iceberg_table(stage)).using(
                    "iceberg"
                ).createOrReplace()
            except Exception as e:
                msg = str(e)
                if (
                    "ClassNotFound" in msg
                    or "Failed to find data source" in msg
                    or "Cannot find catalog plugin" in msg
                    or "CATALOG_NOT_FOUND" in msg
                ):
                    raise RuntimeError(
                        "table_format='iceberg' needs the iceberg-spark-"
                        "runtime jar on the Spark session (spark.jars."
                        "packages=org.apache.iceberg:iceberg-spark-runtime-"
                        f"...); underlying error: {e}"
                    ) from e
                raise
        else:
            df.write.mode("overwrite").parquet(self._path(stage))

    def _read_stage(self, stage: str) -> DataFrame:
        if self.cfg.table_format == "iceberg":
            return self.spark.read.table(self._iceberg_table(stage))
        return self.spark.read.parquet(self._path(stage))

    def _lineage_rows_iceberg(self, stage: str) -> list[dict]:
        """Lineage for an iceberg stage from the COMMITTED snapshot's
        `files` metadata table — data/ may hold orphaned pre-commit files
        a footer walk would wrongly count (ADVICE r4); the snapshot file
        list is the committed truth."""
        files = (
            self.spark.read.table(f"{self._iceberg_table(stage)}.files")
            .select("file_path", "record_count")
            .collect()
        )
        return [
            {
                "stage": stage,
                "partition_id": i,
                "n_rows": int(r["record_count"]),
                "file": os.path.basename(r["file_path"]),
            }
            for i, r in enumerate(sorted(files, key=lambda r: r["file_path"]))
        ]

    def _materialize(self, stage: str, df: DataFrame) -> DataFrame:
        """Write stage output + lineage unless already done; read it back
        (so downstream plans start from the checkpoint, not the lineage)."""
        path = self._path(stage)
        if not self._stage_done(stage):
            t0 = time.time()
            self._write_stage(df, stage)
            self.stage_seconds[stage] = time.time() - t0
            rows = (
                self._lineage_rows_iceberg(stage)
                if self.cfg.table_format == "iceberg"
                else _lineage_rows(path, stage)
            )
            # lineage rows are driver-side metadata (a handful per stage):
            # a pyarrow write keeps the parquet-table contract without
            # paying a Spark job per stage (scheduling latency was pure
            # fixed overhead in the e2e critical path)
            import pyarrow as pa
            import pyarrow.parquet as pq

            mdir = os.path.join(self.workdir, "metrics_lineage")
            os.makedirs(mdir, exist_ok=True)
            tbl = pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        ("stage", pa.string()),
                        ("partition_id", pa.int32()),
                        ("n_rows", pa.int64()),
                        ("file", pa.string()),
                    ]
                ),
            )
            pq.write_table(tbl, os.path.join(mdir, f"{stage}.parquet"))
        return self._read_stage(stage)


    def _stage_rowcount(self, stage: str, df) -> int:
        """Row count of a just-materialized stage. Parquet: footer sum —
        no Spark job, and overwrite mode guarantees the dir holds exactly
        this write's files. Iceberg: data/ may hold ORPHANED files from a
        crashed pre-commit attempt (Iceberg never clears them), so the
        footer walk would overcount — read the committed snapshot and
        count it instead."""
        if self.cfg.table_format != "parquet":
            return self._read_stage(stage).count()
        return sum(r["n_rows"] for r in _lineage_rows(self._path(stage), ""))

    # ---- stages ----------------------------------------------------------

    def _with_collapse_hashes(self, sig_df: DataFrame) -> DataFrame:
        """Append the exact-collapse content-hash columns to the
        signature stage output (round 7): computed in the same map pass
        that already holds the minhash array in memory, so the exact_map
        stage scans (url, sig_h[, sig_h2]) — ~8 B/doc — instead of
        re-reading and re-hashing the 512 B minhash payload (~90% of
        that stage's input bytes). signature_collapse picks the columns
        up when present and falls back to computing them for pre-round-7
        checkpoints."""
        if not self.cfg.exact_collapse:
            return sig_df
        from .operators.signatures import collapse_hash_exprs

        for name, expr in collapse_hash_exprs(
            id_col="url", hash_bits=self.cfg.collapse_hash_bits
        ).items():
            sig_df = sig_df.withColumn(name, expr)
        return sig_df

    def _exact_map_stage(self, sigs: DataFrame) -> DataFrame:
        """Materialize the exact-duplicate map (url, rep) from signature
        content (operators.signatures.signature_collapse). Materialized
        rather than derived: two jobs consume it (edges rep-filter,
        clusters expansion) — at 10^12 docs one ~50 B/doc write+scan beats
        recomputing the (sig_hash, url) shuffle+join twice."""
        if self._stage_done("exact_map"):
            return self._read_stage("exact_map")
        from .operators.signatures import signature_collapse

        return self._materialize(
            "exact_map",
            signature_collapse(sigs, hash_bits=self.cfg.collapse_hash_bits),
        )

    @staticmethod
    def _rep_sigs(sigs_u: DataFrame, exact_map: DataFrame | None) -> DataFrame:
        """Restrict signatures to exact-group representatives via a
        BROADCAST semi-join on 8-byte uids (the rep set is ~|distinct
        texts| longs — tens of MB at sandbox scale; a 10^12-doc deployment
        replaces this with a storage-partitioned join, DESIGN.md)."""
        if exact_map is None:
            return sigs_u
        rep_uids = (
            exact_map.where(F.col("url") == F.col("rep"))
            .select(F.xxhash64("rep").alias("uid"))
        )
        return sigs_u.join(F.broadcast(rep_uids), "uid", "left_semi")

    def run(self, pages: DataFrame) -> DataFrame:
        cfg = self.cfg
        if cfg.fuse_stages:
            return self._run_fused(pages)
        if self._stage_done("extracted"):
            extracted = self._read_stage("extracted")
        else:
            extracted = self._materialize("extracted", extract_stage(pages))

        if self._stage_done("signatures"):
            sigs = self._read_stage("signatures")
        else:
            sigs = self._materialize(
                "signatures",
                self._with_collapse_hashes(
                    signature_stage(
                        extracted,
                        num_hashes=cfg.num_hashes,
                        shingle_k=cfg.shingle_k,
                        seed=cfg.seed,
                    )
                ),
            )

        # band/candidate/verify run on an 8-byte surrogate uid =
        # xxhash64(url) instead of full url strings: the band explode
        # ships 25 rows/doc through the hottest shuffle, so key width is
        # shuffle bytes x25 (measured ~40% of that exchange); the verify
        # join relabels back to urls before anything is persisted as
        # edges. Collision odds are n^2/2^65 (~5e-8 at 1.36M docs); a
        # 10^12-doc deployment widens this to 128 bits (two seeded
        # xxhash64 columns) — same plan shape.
        sigs_u = sigs.withColumn("uid", F.xxhash64("url"))
        exact_map = self._exact_map_stage(sigs) if cfg.exact_collapse else None
        if self._stage_done("pairs"):
            pairs = self._read_stage("pairs")
        else:
            keys = band_keys(
                self._rep_sigs(sigs_u, exact_map),
                id_col="uid",
                bands=cfg.bands,
                rows_per_band=cfg.rows_per_band,
            )
            pairs_df, bucket_obs = candidate_pairs(
                keys, id_col="uid", bucket_cap=cfg.bucket_cap
            )
            # the parquet write below is the action that populates the
            # bucket-stats Observation — no separate stats job runs
            pairs = self._materialize("pairs", pairs_df)
            n_pairs = self._stage_rowcount("pairs", pairs)
            if n_pairs > 0:
                stats = bucket_obs.get
            else:
                # zero pairs: AQE empty-relation pruning skipped the
                # CollectMetrics node — recompute explicitly (tiny input)
                from .operators.lsh import bucket_stats_job

                stats = bucket_stats_job(keys, cfg.bucket_cap)
            with open(os.path.join(self.workdir, "bucket_stats.json"), "w") as f:
                json.dump({k: float(v) for k, v in stats.items()}, f)

        if self._stage_done("edges"):
            edges = self._read_stage("edges")
        else:
            edges = self._materialize(
                "edges",
                verify_stage(
                    pairs,
                    sigs_u,
                    id_col="uid",
                    label_col="url",
                    num_hashes=cfg.num_hashes,
                    jaccard_threshold=cfg.jaccard_threshold,
                    simhash_radius=cfg.simhash_radius,
                    hamming_est_floor=cfg.hamming_est_floor,
                ),
            )

        if self.cfg.extra.get("substring_pass"):
            # exact long-repeat pass (north-star suffix-array analog):
            # separate output table — sharing a boilerplate run does NOT
            # make two pages near-duplicates, so these pairs are reported
            # for span-removal jobs rather than merged into clusters
            if not self._stage_done("substring_pairs"):
                from .operators.substring import substring_pairs

                self._materialize(
                    "substring_pairs",
                    substring_pairs(
                        extracted,
                        gram_chars=self.cfg.extra.get("substring_gram", 64),
                        window=self.cfg.extra.get("substring_window", 32),
                        bucket_cap=cfg.bucket_cap,
                    ),
                )

        if self.cfg.extra.get("span_dedup"):
            # substring SPAN REMOVAL (Lee et al. 2022 keep-first policy):
            # a rewritten-text table alongside the cluster output — span
            # cuts change documents, they don't merge them, so this is a
            # sibling artifact, not a cluster input (operators.substring.
            # dedup_spans docstring has the guarantee + capping caveat)
            if not self._stage_done("spans_removed"):
                from .operators.substring import dedup_spans

                self._materialize(
                    "spans_removed",
                    dedup_spans(
                        extracted,
                        gram_chars=self.cfg.extra.get("substring_gram", 64),
                        window=self.cfg.extra.get("substring_window", 32),
                        bucket_cap=cfg.bucket_cap,
                    ),
                )

        if self._stage_done("clusters"):
            clusters = self._read_stage("clusters")
        else:
            # edge count from the materialized stage's parquet footers —
            # spares CC its count-probe job
            n_edges = self._stage_rowcount("edges", edges)
            if exact_map is not None:
                clusters_df = components_with_exact_map(
                    edges.select("src", "dst"),
                    exact_map,
                    edge_count_hint=n_edges,
                    edges_distinct=True,
                    small_graph_threshold=cfg.cc_small_graph_threshold,
                    string_hash_threshold=cfg.cc_string_hash_threshold,
                    broadcast_edge_threshold=cfg.cc_broadcast_edge_threshold,
                )
            else:
                clusters_df = components_with_singletons(
                    edges.select("src", "dst"),
                    extracted,
                    "url",
                    edge_count_hint=n_edges,
                    ids_unique=True,  # stage outputs are keyed by url
                    edges_distinct=True,  # candidate_pairs already dedups
                    small_graph_threshold=cfg.cc_small_graph_threshold,
                    string_hash_threshold=cfg.cc_string_hash_threshold,
                    broadcast_edge_threshold=cfg.cc_broadcast_edge_threshold,
                )
            clusters = self._materialize("clusters", clusters_df)

        if self.cfg.extra.get("audit") and not self._stage_done("audit"):
            # post-hoc adversarial verification (R1-R5 analog): re-check a
            # sample of kept edges against exact shingle Jaccard
            from .operators.audit import audit_edges

            self._materialize(
                "audit",
                audit_edges(
                    edges,
                    extracted,
                    shingle_k=cfg.shingle_k,
                    sample_fraction=self.cfg.extra.get("audit_fraction", 0.1),
                    jaccard_threshold=cfg.jaccard_threshold,
                    seed=cfg.seed,
                ),
            )
        return clusters

    def _run_fused(self, pages: DataFrame) -> DataFrame:
        """Three-job layout (fuse_stages=True):

          1 signatures  extract_stage piped straight into signature_stage —
                        the text column never hits disk; the ArrowEvalPython
                        extract node and the mapInArrow signature kernel
                        pipeline inside one stage.
          2 edges       band_keys -> candidate_pairs -> verify, one job —
                        the pair explosion feeds the verify join without a
                        parquet round-trip; bucket stats still ride the
                        write action as an Observation.
          3 clusters    same CC as the five-stage path; all_ids come from
                        the signatures table (1:1 with pages by url).

        Resume granularity is signatures/edges/clusters instead of all five
        stages — that is the documented tradeoff.
        """
        cfg = self.cfg
        if self._stage_done("signatures"):
            sigs = self._read_stage("signatures")
        else:
            sigs = self._materialize(
                "signatures",
                self._with_collapse_hashes(
                    signature_stage(
                        extract_stage(pages),
                        num_hashes=cfg.num_hashes,
                        shingle_k=cfg.shingle_k,
                        seed=cfg.seed,
                    )
                ),
            )

        exact_map = self._exact_map_stage(sigs) if cfg.exact_collapse else None
        if self._stage_done("edges"):
            edges = self._read_stage("edges")
        else:
            # same 8-byte surrogate-uid keying as the staged path (see
            # run() comment); urls re-enter via the verify join relabel
            sigs_u = sigs.withColumn("uid", F.xxhash64("url"))
            keys = band_keys(
                self._rep_sigs(sigs_u, exact_map),
                id_col="uid",
                bands=cfg.bands,
                rows_per_band=cfg.rows_per_band,
            )
            pairs_df, bucket_obs = candidate_pairs(
                keys, id_col="uid", bucket_cap=cfg.bucket_cap
            )
            edges = self._materialize(
                "edges",
                verify_stage(
                    pairs_df,
                    sigs_u,
                    id_col="uid",
                    label_col="url",
                    num_hashes=cfg.num_hashes,
                    jaccard_threshold=cfg.jaccard_threshold,
                    simhash_radius=cfg.simhash_radius,
                    hamming_est_floor=cfg.hamming_est_floor,
                ),
            )
            n_edges = self._stage_rowcount("edges", edges)
            if n_edges > 0:
                stats = bucket_obs.get
            else:
                from .operators.lsh import bucket_stats_job

                stats = bucket_stats_job(keys, cfg.bucket_cap)
            with open(os.path.join(self.workdir, "bucket_stats.json"), "w") as f:
                json.dump({k: float(v) for k, v in stats.items()}, f)

        if self._stage_done("clusters"):
            clusters = self._read_stage("clusters")
        else:
            n_edges = self._stage_rowcount("edges", edges)
            if exact_map is not None:
                clusters_df = components_with_exact_map(
                    edges.select("src", "dst"),
                    exact_map,
                    edge_count_hint=n_edges,
                    edges_distinct=True,
                    small_graph_threshold=cfg.cc_small_graph_threshold,
                    string_hash_threshold=cfg.cc_string_hash_threshold,
                    broadcast_edge_threshold=cfg.cc_broadcast_edge_threshold,
                )
            else:
                clusters_df = components_with_singletons(
                    edges.select("src", "dst"),
                    sigs,
                    "url",
                    edge_count_hint=n_edges,
                    ids_unique=True,
                    edges_distinct=True,  # candidate_pairs already dedups
                    small_graph_threshold=cfg.cc_small_graph_threshold,
                    string_hash_threshold=cfg.cc_string_hash_threshold,
                    broadcast_edge_threshold=cfg.cc_broadcast_edge_threshold,
                )
            clusters = self._materialize("clusters", clusters_df)
        return clusters

    # ---- reports ---------------------------------------------------------

    def summary(self) -> dict:
        """A5/A6 analog (/root/reference/analysis_engine.py:649-663):
        duplicate/unique/total counts from the clusters table."""
        clusters = self._read_stage("clusters")
        agg = (
            clusters.groupBy("cluster_id")
            .agg(F.count("*").alias("sz"))
            .agg(
                F.count("*").alias("n_clusters"),
                F.sum("sz").alias("total"),
                F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(0)).alias(
                    "in_dup_clusters"
                ),
                F.sum(F.when(F.col("sz") == 1, 1).otherwise(0)).alias("unique"),
            )
            .collect()[0]
        )
        return {k: int(v) for k, v in agg.asDict().items()}

    def export_pdf(self, pdf_path: str, sample_rows: int = 500) -> str:
        """S6+S7 presentation pair in one call (the reference's
        analysis_engine report -> excel_converter PDF hand-off): render
        the run's Dashboard (summary counters), a User File Data sample
        (clusters stage, min-url-first), and the Analysis Report
        (dup-cluster members) into one PDF via the native writer
        (operators/pdf_report). Driver-bounded by sample_rows per
        section; the stage tables remain the full result."""
        from .operators.pdf_report import dashboard_df, export_pdf_report

        clusters = self._read_stage("clusters")
        sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("sz"))
        dups = (
            clusters.join(sizes.where(F.col("sz") > 1), "cluster_id")
            .orderBy("cluster_id", "url")
            .select("cluster_id", "url", "sz")
        )
        return export_pdf_report(
            [
                ("Dashboard", dashboard_df(self.spark, self.summary())),
                ("User File Data", clusters.orderBy("url")),
                ("Analysis Report", dups),
            ],
            pdf_path,
            title=f"Dedup run {os.path.basename(self.workdir)}",
            section_limit=sample_rows,
        )
