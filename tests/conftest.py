"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the environment before the first jax import anywhere in the test
session (SURVEY.md §4: multi-device tests via
--xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already be imported (pytest plugins) with the platform config read
# from a pre-conftest environment — force it programmatically too.
jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is deliberately NOT enabled for
# tests — XLA:CPU AOT artifacts are machine-feature-pinned and reloading them
# on a slightly different host risks SIGILL.

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_config():
    """A tiny ModelConfig exercising every architectural feature cheaply."""
    from vilbert_tpu.core.config import ModelConfig

    return ModelConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        v_feature_size=16,
        v_hidden_size=24,
        v_num_hidden_layers=2,
        v_num_attention_heads=4,
        v_intermediate_size=48,
        v_target_size=11,
        bi_hidden_size=32,
        bi_num_attention_heads=4,
        v_biattention_id=(0, 1),
        t_biattention_id=(2, 3),
        compute_dtype="float32",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0,
        v_attention_probs_dropout_prob=0.0,
    )


@pytest.fixture()
def rng_np():
    return np.random.RandomState(0)
