"""Test harness: force an 8-device virtual CPU backend before JAX initializes.

This is the standard JAX fake-backend trick for testing multi-device sharding
without hardware — the rebuild's replacement for the reference's nonexistent
multi-node test story (see SURVEY.md §4). All unit tests run on CPU so they are
hermetic and fast; TPU behavior is covered by bench.py and the driver's
compile checks.
"""

import os

# Hard-assign: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel
# plugin), so setdefault would silently leave tests running on the single
# remote TPU — slow, and concurrent test processes deadlock on it.
os.environ["JAX_PLATFORMS"] = "cpu"

# TF-oracle tests (test_tf_oracle.py) import the reference scripts, which do
# `from tensorflow.keras import ...` — that must resolve to tf_keras (Keras 2
# API), and the switch is only honored if set before tensorflow ever loads.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(865)
