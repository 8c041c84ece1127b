"""Dynamic int8 matmuls for inference (TPU-native; the reference has none).

The v5e MXU executes int8xint8->int32 at twice the bf16 rate, and the eval
path is matmul-bound (the reference evaluates fp16 at best, eval_tasks.py).
This module quantizes IN-GRAPH — symmetric per-tensor activations, symmetric
per-output-channel weights — so the stored checkpoint stays fp32/bf16 and
nothing about import/export changes:

    y = dot(q(x):int8, q(w):int8 -> int32) * (s_x * s_w)

The weight quantize is an elementwise pass over [in, out] fused by XLA and
amortized over the batch; the activation quantize needs one abs-max
reduction. Enable with ``ModelConfig.int8_matmul`` (inference only — no
gradient rules are defined; training quality would also need QAT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _quantize(x: jax.Array, axes, eps: float = 1e-8):
    """Symmetric int8 quantization; scale over ``axes`` (None = per-tensor).

    Returns (q, scale) with x ~ q * scale, q in [-127, 127]."""
    amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    scale = (amax / 127.0 + eps).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(x: jax.Array, kernel: jax.Array, out_dtype) -> jax.Array:
    """[..., in] @ [in, out] with int8 MXU arithmetic.

    Activations per-tensor, kernel per-output-channel (axis 0 reduced)."""
    xq, sx = _quantize(x, axes=None)
    wq, sw = _quantize(kernel, axes=0)  # [1, out]
    y = lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def int8_head_proj(x: jax.Array, w: jax.Array, out_dtype) -> jax.Array:
    """einsum('bsi,ihd->bhsd') with int8 arithmetic (head-major projection).

    Weight scales per (h, d) output channel (axis i reduced)."""
    xq, sx = _quantize(x, axes=None)
    wq, sw = _quantize(w, axes=0)  # [1, h, d]
    y = lax.dot_general(
        xq, wq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [b, s, h, d]
    y = (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
    return y.transpose(0, 2, 1, 3)  # -> [b, h, s, d]


def int8_merge_proj(ctx: jax.Array, w: jax.Array, out_dtype) -> jax.Array:
    """Head-merge projection [B,h,S,d] x [h*d, out] with int8 arithmetic.

    Contracts (h, d) (= einsum('bhsd,hdo->bso') on the reshaped kernel);
    weight scales per output channel."""
    b, h, s, d = ctx.shape
    x2 = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    return int8_dense(x2, w.reshape(h * d, -1), out_dtype)
