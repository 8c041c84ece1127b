"""Counter-hash dropout — RNG-free dropout masks.

Dropout is the dominant non-matmul cost of ViLBERT training on TPU: ~600M
mask elements per CC step across the FFN/hidden/attention sites. Generating
them with threefry costs ~28% of the v5e step (196.6 -> 141.8 ms/step
measured without dropout); the rbg generator recovers only part of it.

This module derives the mask from a murmur3-finalizer hash of (flat element
index, per-call seed): a handful of VPU integer ops that XLA fuses straight
into the surrounding elementwise work — no RNG state, no separate mask
materialization pass. The per-call seed comes from folding the flax dropout
rng once (one tiny threefry call per site, not per element).

Statistical quality is far beyond what dropout needs (murmur3's finalizer
passes avalanche tests); determinism given (rng, shape) matches standard
dropout semantics.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _murmur_mix(x: jax.Array) -> jax.Array:
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _mix2_mix(x: jax.Array) -> jax.Array:
    # one-round finalizer (lowbias32-style constant). u32 multiplies are
    # EMULATED on the TPU VPU (16-bit partial products), so each round
    # saved matters at ~600M mask elements/step; one round after the
    # golden-ratio prepare multiply still passes the keep-rate and
    # lag-autocorrelation checks in tests/test_fast_dropout.py::
    # test_hash_variant_statistics (dropout dominates
    # nothing statistically — thresholding needs marginal uniformity, not
    # crypto avalanche).
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x21F0AAAD)
    x = x ^ (x >> 15)
    return x


_MIXERS = {"murmur3": _murmur_mix, "mix2": _mix2_mix}


def hash_keep_mask(
    shape, rate: float, seed: jax.Array, variant: str = "murmur3"
) -> jax.Array:
    """Boolean keep-mask with P(keep) = 1 - rate, from a scalar uint32 seed."""
    n = int(np.prod(shape))
    # 2D iota (TPU requires >=2D); flatten afterwards
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
    x = idx * jnp.uint32(0x9E3779B1) ^ seed.astype(jnp.uint32) * jnp.uint32(
        0x27D4EB2F
    )
    bits = _MIXERS[variant](x)
    threshold = np.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return (bits >= threshold).reshape(shape)


def hash_dropout(
    x: jax.Array,
    rate: float,
    rng: Optional[jax.Array],
    *,
    deterministic: bool = False,
    variant: str = "murmur3",
) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    assert rng is not None
    seed = jax.random.bits(rng, (), jnp.uint32)  # one tiny fold per site
    keep = hash_keep_mask(x.shape, rate, seed, variant)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


class FastDropout(nn.Module):
    """Drop-in replacement for flax nn.Dropout using the counter hash."""

    rate: float
    variant: str = "murmur3"

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        return hash_dropout(
            x, self.rate, self.make_rng("dropout"), deterministic=False,
            variant=self.variant,
        )
