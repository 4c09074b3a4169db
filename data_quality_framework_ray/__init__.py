"""Ray-Data-native data-quality / quality-filter engine.

A from-scratch re-expression of the capabilities of the reference
``89bgt/data-quality-framework`` (see ``SURVEY.md``) as an idiomatic Ray Data
pipeline: ``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful model stages, groupby/aggregate for the wide steps,
per-fragment lineage checkpointing for resume.

Layout:
    datagen/    deterministic synthetic clip-table generator (FIXTURES.md)
    sources/    fragment store (Lance-style parquet fragments + manifest)
    functions/  pure vectorized kernels (audio codecs, text stats, scrub, hashing)
    stages/     map_batches stages (decode, rules, scrub, langid, perplexity)
    pipelines/  composed pipelines (quality filter, dedup, similarity, text analysis,
                expectations)
    state/      lineage/checkpoint + metrics history (dynamic thresholds)
"""

import os as _os

# Every Ray worker gets a 1-CPU reservation; nested thread pools inside a
# worker (polars' rayon pool spins/yields when oversubscribed → system-time
# storms measured at 15% sys / 0.5% user) must be pinned BEFORE the first
# polars import anywhere in the package.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.1.0"
