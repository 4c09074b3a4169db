"""Session-scoped Ray + shared clip fixtures (one ray.init per pytest session
per the driver contract)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")  # workers inherit via raylet

MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "models")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def clips_dir(tmp_path_factory) -> str:
    """Deterministic 1200-clip / 6-fragment table (FIXTURES.md t1 scale)."""
    from data_quality_framework_ray.datagen.clips import generate_clips

    d = str(tmp_path_factory.mktemp("clips"))
    generate_clips(d, n_clips=1200, n_fragments=6, seed=42)
    return d


@pytest.fixture(scope="session")
def pipeline_out(ray_session, clips_dir, tmp_path_factory) -> str:
    """One full flagship run shared by the pipeline-level tests."""
    from data_quality_framework_ray.pipelines import quality_filter as qf

    out = str(tmp_path_factory.mktemp("out"))
    qf.run(clips_dir, out, models_dir=MODELS_DIR)
    return out


@pytest.fixture(scope="session")
def oracle_labels(clips_dir):
    """Independent labels for the shared clip table (tests/oracle.py)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from data_quality_framework_ray.datagen.clips import fragment_paths
    from tests import oracle

    df = pd.concat([pq.read_table(p).to_pandas() for p in fragment_paths(clips_dir)],
                   ignore_index=True)
    return oracle.label_clips(df, MODELS_DIR)
