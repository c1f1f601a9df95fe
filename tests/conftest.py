"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu" programmatically, overriding the env var — undo it
# before any backend is initialized so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(123)


@pytest.fixture
def tiny_vocab():
    from vcr_tpu.vocab import tiny_vocab as make

    words = ["a", "man", "is", "playing", "guitar", "dog", "runs", "the",
             "woman", "cooking", "food", "cat", "jumps", "on", "table"]
    return make(words, dim=16, seed=0)
