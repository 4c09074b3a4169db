"""Engine-side constants. Semantics documented in SPEC.md — the test oracle
(`tests/oracle.py`) deliberately duplicates these values instead of importing them
(independent-implementation requirement, SURVEY.md §5.2)."""

from __future__ import annotations

import os

# ---- rule thresholds (SPEC.md "Rules") ----
LEN_MIN = 3
LEN_MAX = 5000
REPETITION_MIN_TOKENS = 5
REPETITION_MAX = 0.5
SYMBOL_RATIO_MAX = 0.30
CPS_MIN = 1.0
CPS_MAX = 50.0
ALLOWED_SR = (8000, 16000, 22050, 44100)
CODEC_BYTES_PER_SAMPLE = {"pcm16": 2, "ulaw": 1, "alaw": 1}
LANG_ALLOWLIST = ("en", "fr", "de", "es")
LANG_CONF_MIN = 0.60
PPL_MAX = 25.0
TOXICITY_LEXICON = ("frak", "blargh", "drekk", "gorram", "smeg")

# ---- PII scrub (SPEC.md "PII scrub"; order matters) ----
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("CARD", r"\b(?:\d[ -]?){15}\d\b", "<CARD>"),
    ("PHONE", r"\+\d{1,3}(?:[ -]\d{2,4}){2,4}\b", "<PHONE>"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)

# ---- models (SPEC.md "Language ID" / "Perplexity") ----
LANGID_CLASSES = ("en", "fr", "de", "es", "it", "xx")
LANGID_BUCKETS = 32768
LANGID_NGRAM_MAX = 3
LANGID_HASH_MOD = (1 << 61) - 1
CHARLM_BACKOFF = 0.4
CHARLM_MAX_ALPHABET = 63  # + UNK slot 0
MODELS_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "models")

# ---- reference-check semantics (SPEC.md last section) ----
NULL_FRACTION_MAX = 0.01
DYNAMIC_THRESHOLD_TOLERANCE = 0.20
DYNAMIC_THRESHOLD_HISTORY = 10
STATIC_ROW_COUNT_MIN = 2
URGENCY_BUCKETS = ((25.0, "CRITICAL"), (50.0, "HIGH"), (75.0, "MEDIUM"), (100.0, "LOW"))

# ---- execution tuning ----
DEFAULT_BATCH_SIZE = 2048          # clips per batch in audio stages (binary payloads)
TEXT_BATCH_SIZE = 4096             # rows per batch in text-only stages
MODEL_POOL_SIZE = (1, 8)           # actor-pool autoscaling bounds for model stages;
                                   # min=1 so two pools never reserve every CPU of a
                                   # small node and starve the read/sink tasks
BROADCAST_DUP_LIMIT = 5_000_000    # max duplicate-group entries to broadcast (see
                                   # pipelines/quality_filter.py dedup notes);
                                   # above it the dedup paths switch to the
                                   # distributed Dataset.join/groupby fallbacks
MEMBERSHIP_BROADCAST_LIMIT = 5_000_000  # hot-bucket KEYS broadcast (pc.is_in)
                                   # up to this count inside the distributed
                                   # dedup paths; deliberately separate from
                                   # BROADCAST_DUP_LIMIT so tests forcing the
                                   # distributed paths (limit=0) don't also
                                   # force the membership filter into a
                                   # Dataset.join with near-empty right
                                   # partitions (Ray 2.49.2 ArrowInvalid)
MAX_PAIRS_PER_BUCKET = 100_000     # full all-pairs verification per LSH bucket up
                                   # to this many pairs (bucket ≈ 450 members);
                                   # larger buckets emit star+chain pairs (2k-3)
                                   # — documented recall tradeoff in dedup.py
EMB_BUCKET_CAP = 256               # embedding dedup: full O(n²) cosine verify up
                                   # to this bucket size; larger buckets recurse
                                   # with fresh hyperplanes (see dedup.py)
DRIVER_PAIR_LIMIT = 2_000_000      # verified-pair count above which connected
                                   # components run distributed (label propagation)
                                   # instead of driver union-find
TOPK_MERGE_LIMIT = 1_000_000       # similarity partial-row count (nq*k*blocks)
                                   # above which the top-k merge runs as a
                                   # distributed groupby instead of one
                                   # vectorized driver pass
PARTIAL_FOLD_LIMIT = 2_000_000     # per-batch partial rows (groups/bins ×
                                   # batches) folded on the driver in
                                   # pipelines/stats.py; above it the fold
                                   # runs as a distributed groupby Sum
                                   # (round-4 verdict #6)
FINALIZE_WAVES = 4                 # phase-B finalize task waves per CPU:
                                   # tasks = CPUs × this, several part files
                                   # per task. 1 wave minimizes dispatch
                                   # constants but loses straggler
                                   # rebalancing; measured best at 4 for
                                   # 2–32 CPUs (see quality_filter finalize
                                   # comment)
