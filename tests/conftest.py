"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding paths are validated on a fake CPU mesh
(``--xla_force_host_platform_device_count=8``), per the reference test
strategy discussion in SURVEY.md §4 (point 5).
"""

import os

# Unconditional: the session environment points JAX at the real TPU with a
# config default of "axon,cpu" that overrides the JAX_PLATFORMS env var;
# tests always run on the virtual 8-device CPU mesh, so force the config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """A small preprocessed synthetic dataset shared across the session."""
    from seqrec_tpu.data.synthetic import make_dataset

    dirname = tmp_path_factory.mktemp("ds")
    return make_dataset(
        str(dirname), n_users=120, n_items=60, min_len=8, max_len=24, seed=3
    )


@pytest.fixture(scope="session")
def synthetic_handler(synthetic_dataset):
    from seqrec_tpu.data import DataHandler

    return DataHandler(synthetic_dataset)


class FakeDataset:
    """Minimal stand-in for DataHandler in metric unit tests."""

    def __init__(self, n_items=100, item_popularity=None, dirname=""):
        self.n_items = n_items
        self.item_popularity = (
            np.arange(n_items, 0, -1)
            if item_popularity is None
            else np.asarray(item_popularity)
        )
        self.dirname = dirname


@pytest.fixture
def fake_dataset():
    return FakeDataset()


# XLA:CPU's persistent-cache AOT loader intermittently aborts when
# re-loading executables (machine-feature mismatch diagnostics point at
# codegen/host drift; seqrec_tpu/__init__.py segregates the cache per
# CPU fingerprint, but same-machine reloads of scatter-heavy sharded
# programs still aborted). Tests recompile from scratch — ~1 min total.
os.environ.setdefault("SEQREC_NO_COMPILE_CACHE", "1")
