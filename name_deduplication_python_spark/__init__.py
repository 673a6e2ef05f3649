"""PySpark-native web-scale near-duplicate detection & clustering engine.

A from-scratch re-imagining of the entity-resolution pipeline in
calguard/Name-Deduplication-Python (see /root/repo/SURVEY.md) as a
Common-Crawl-style text-dedup engine:

    extract (html -> text, byte-deterministic)
      -> k-shingle MinHash signatures (Arrow-batched numpy)
      -> LSH band hashing + salted/capped band-bucket candidate join
      -> SimHash Hamming-ball + MinHash-Jaccard verification
      -> iterative large-star/small-star connected components
      -> checkpointed, lineage-tracked cluster outputs.

Reference semantics mapping is documented per-module via SURVEY.md §2
operator ids (J1/J2, F1-F4, A1, ...). No code is copied from the
reference; all hot paths are native DataFrame ops or pandas/Arrow UDFs.
"""

__version__ = "0.1.0"

DEFAULT_CONFIG = {
    # Fixed dedup config (BASELINE.md bench protocol): record next to every number.
    "shingle_k": 5,          # words per shingle
    "num_hashes": 128,       # MinHash functions
    # banding: P(candidate | J) = 1 - (1 - J^r)^b. At theta=0.8 the gate
    # needs P >= 0.99: 16x8 gives 0.947 (FAILS), 25x5 gives 0.99995.
    # S-curve midpoint (1/b)^(1/r) = 0.525 — moderate-similarity false
    # candidates are filtered by the native verifier.
    "bands": 25,             # LSH bands (uses minhash[0:125] of 128)
    "rows_per_band": 5,
    "simhash_bits": 64,
    "simhash_radius": 3,     # Hamming-ball verify radius
    "jaccard_threshold": 0.80,
    "bucket_cap": 64,        # full pairing below, capped pairing above (skew guard)
    "seed": 42,
    # precision tier (None = reference OR-semantics): when set, an edge
    # admitted ONLY by the SimHash Hamming ball additionally needs
    # est_jaccard >= this floor (operators.verify.hamming_floor() gives
    # the recommended strict value, ~0.635 at this config).
    "hamming_est_floor": None,
    # streaming store membership prefilter (operators/bloom.py): when on,
    # each epoch appends a Bloom word table over its band hashes and
    # subsequent batches drop definitely-new bh values BEFORE the store
    # key read — novel-bucket batches skip store partitions entirely.
    # Off by default (identical results either way; the filter only
    # prunes). bloom_bits=2^20 -> 16k words (~128 KB broadcast), k=4.
    "bloom_prefilter": False,
    "bloom_bits": 1 << 20,
    "bloom_k": 4,
}
