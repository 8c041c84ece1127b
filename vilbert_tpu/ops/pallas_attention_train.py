"""Fused attention with in-kernel dropout: Pallas forward AND backward.

The training path drops whole attention keys (probability dropout on the
softmax output, reference BertSelfAttention vilbert.py:440-444). Generating
those masks with jax.random outside the kernel costs ~15-30% of the step on
v5e (threefry; see utils/cache.setup_tpu_defaults notes). Here the mask is
generated *inside* the kernel with the TPU hardware PRNG
(pltpu.prng_random_bits) and never materialized in HBM:

- forward: seed the per-tile PRNG from a scalar-prefetch seed, compute
  softmax(QK^T·scale + bias), drop/rescale, PV — one VMEM pass;
- backward: re-seed with the SAME per-tile seed, regenerate the identical
  mask bits, recompute probabilities (flash-attention-style recompute), and
  produce dq/dk/dv — one VMEM pass, no saved probabilities or masks.

Residuals are only (q, k, v, bias, seed). Works for dropout_rate == 0 too
(the PRNG call is statically elided).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(shape, rate: float, seed):
    """Counter-based uniform bits -> keep mask with P(keep) = 1 - rate.

    A murmur3-finalizer hash over (row, col, seed) rather than the TPU
    hardware PRNG: identical on every platform (so the CPU interpret tests
    cover the real kernel), trivially reproducible between the forward and
    backward kernels, and pure VPU integer ops.
    """
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (
        row * jnp.uint32(0x9E3779B1)
        ^ (col + jnp.uint32(0x7F4A7C15)) * jnp.uint32(0x85EBCA77)
        ^ seed.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    threshold = np.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return x >= threshold


def _probs(q_ref, k_ref, bias_ref, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias_ref[0, 0][None, :].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                scale: float, rate: float):
    p = _probs(q_ref, k_ref, bias_ref, scale)
    if rate > 0.0:
        seed = seed_ref[0] + pl.program_id(0) * 7919
        keep = _keep_mask(p.shape, rate, seed)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, rate: float):
    p = _probs(q_ref, k_ref, bias_ref, scale)  # [Sq, Sk] fp32
    g = g_ref[0].astype(jnp.float32)           # [Sq, d]
    v = v_ref[0].astype(jnp.float32)           # [Sk, d]
    if rate > 0.0:
        seed = seed_ref[0] + pl.program_id(0) * 7919
        keep = _keep_mask(p.shape, rate, seed)
        inv_keep = 1.0 / (1.0 - rate)
        p_dropped = jnp.where(keep, p * inv_keep, 0.0)
    else:
        keep = None
        p_dropped = p

    # dv = p_dropped^T @ g
    dv = jax.lax.dot_general(
        p_dropped, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp_dropped = g @ v^T ; chain through the dropout mask
    dpd = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        dp = jnp.where(keep, dpd * inv_keep, 0.0)
    else:
        dp = dpd
    # softmax VJP: ds = p * (dp - sum(dp * p, -1))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _grid_spec(bh, sq, sk, d, num_heads, n_extra_in, n_out):
    # index maps receive (grid idx, *scalar_prefetch_refs)
    tile = lambda i, _s: (i, 0, 0)
    in_specs = [
        pl.BlockSpec((1, sq, d), tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk, d), tile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, sk), lambda i, _s: (i // num_heads, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for _ in range(n_extra_in):
        in_specs.append(
            pl.BlockSpec((1, sq, d), tile, memory_space=pltpu.VMEM)
        )
    out_spec = pl.BlockSpec((1, sq, d), tile, memory_space=pltpu.VMEM)
    out_specs = out_spec if n_out == 1 else tuple(
        pl.BlockSpec((1, s, d), tile, memory_space=pltpu.VMEM)
        for s in ([sq, sk, sk] if n_out == 3 else [sq])
    )
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=in_specs,
        out_specs=out_specs,
    )


def _fwd_call(qh, kh, vh, bias_rows, seed, num_heads, rate, interpret):
    bh, sq, d = qh.shape
    sk = kh.shape[1]
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_fwd_kernel, scale=scale, rate=rate)
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(bh, sq, sk, d, num_heads, 0, 1),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
        interpret=interpret,
    )(seed, qh, kh, vh, bias_rows[:, None, :])


def _bwd_call(qh, kh, vh, bias_rows, seed, g, num_heads, rate, interpret):
    bh, sq, d = qh.shape
    sk = kh.shape[1]
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_bwd_kernel, scale=scale, rate=rate)
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(bh, sq, sk, d, num_heads, 1, 3),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), kh.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), vh.dtype),
        ),
        interpret=interpret,
    )(seed, qh, kh, vh, bias_rows[:, None, :], g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attention_train_folded(qh, kh, vh, bias_rows, seed, num_heads, rate,
                            interpret):
    return _fwd_call(qh, kh, vh, bias_rows, seed, num_heads, rate, interpret)


def _train_fwd(qh, kh, vh, bias_rows, seed, num_heads, rate, interpret):
    out = _fwd_call(qh, kh, vh, bias_rows, seed, num_heads, rate, interpret)
    return out, (qh, kh, vh, bias_rows, seed)


def _train_bwd(num_heads, rate, interpret, residuals, g):
    qh, kh, vh, bias_rows, seed = residuals
    dq, dk, dv = _bwd_call(
        qh, kh, vh, bias_rows, seed, g, num_heads, rate, interpret
    )
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias_rows), dseed


_attention_train_folded.defvjp(_train_fwd, _train_bwd)


def fused_attention_train(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    *,
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Trainable fused attention; differentiable, dropout in-kernel.

    q: [B, Sq, H], k/v: [B, Sk, H], bias: [B,1,1,Sk] additive or None.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, hdim = q.shape
    sk = k.shape[1]
    d = hdim // num_heads

    def fold(x, s):
        return (
            x.reshape(b, s, num_heads, d)
            .transpose(0, 2, 1, 3)
            .reshape(b * num_heads, s, d)
        )

    qh, kh, vh = fold(q, sq), fold(k, sk), fold(v, sk)
    if bias is None:
        bias_rows = jnp.zeros((b, sk), jnp.float32)
    else:
        bias_rows = bias.reshape(b, sk).astype(jnp.float32)
    if dropout_rate > 0.0:
        assert dropout_rng is not None, "dropout_rate > 0 requires a rng"
        seed = jax.random.bits(dropout_rng, (1,), jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _attention_train_folded(
        qh, kh, vh, bias_rows, seed, num_heads, float(dropout_rate), interpret
    )
    return (
        out.reshape(b, num_heads, sq, d).transpose(0, 2, 1, 3).reshape(b, sq, hdim)
    )
