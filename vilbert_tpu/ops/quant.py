"""Int8 matmuls for inference (TPU-native; the reference has none).

The v5e MXU executes int8xint8->int32 at twice the bf16 rate, and the eval
path is matmul-bound (the reference evaluates fp16 at best, eval_tasks.py).
Two modes, both in-graph — the stored checkpoint stays fp32/bf16 and nothing
about import/export changes:

- **dynamic** (``ModelConfig.int8_matmul``): symmetric per-tensor activation
  scales computed per call (one abs-max reduction per site), symmetric
  per-output-channel weight scales:

      y = dot(q(x):int8, q(w):int8 -> int32) * (s_x * s_w)

- **static** (``ModelConfig.int8_static``): PER-CHANNEL activation scales
  calibrated OFFLINE (a mutable-``quant``-collection pass records each
  site's per-channel abs-max over calibration batches; see
  models/layers.py:_int8_act_amax). Per-channel scales over the CONTRACTED
  dim cannot factor out of the dot, so they are folded into the weight
  before weight quantization:

      y_o = Σ_i x_i w_io ≈ Σ_i round(x_i/s_i) · q(w_io·s_i) · s'_o

  This removes the per-call activation abs-max reduction (the HBM-bound
  pass that ate most of dynamic's 2× headroom, docs/perf.md) AND is more
  accurate than per-tensor scales (outlier channels no longer clip the
  rest).

Inference only — no gradient rules; training quality would also need QAT.
"""

from __future__ import annotations

from typing import Optional

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


def _quantize_act_static(x: jax.Array, amax: jax.Array, eps: float = 1e-8):
    """Quantize activations with CALIBRATED per-channel scales.

    ``amax`` is the [in]-vector of calibrated abs-maxes of the contraction
    dim; values outside the calibrated range saturate at ±127 (standard
    static-quant behavior)."""
    scale = (amax / 127.0 + eps).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(
    x: jax.Array, kernel: jax.Array, out_dtype,
    act_amax: Optional[jax.Array] = None,
) -> jax.Array:
    """[..., in] @ [in, out] with int8 MXU arithmetic.

    Dynamic (``act_amax=None``): activations per-tensor. Static: calibrated
    per-channel activation scales folded into the weight (module docstring).
    Kernel scales per output channel either way."""
    if act_amax is None:
        xq, sx = _quantize(x, axes=None)
        wq, sw = _quantize(kernel, axes=0)  # [1, out]
        rescale = sx * sw
    else:
        xq, s_in = _quantize_act_static(x, act_amax)
        folded = kernel.astype(jnp.float32) * s_in[:, None]
        wq, rescale = _quantize(folded, axes=0)  # [1, out]
    y = lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * rescale).astype(out_dtype)


def int8_head_proj(
    x: jax.Array, w: jax.Array, out_dtype,
    act_amax: Optional[jax.Array] = None,
) -> jax.Array:
    """einsum('bsi,ihd->bhsd') with int8 arithmetic (head-major projection).

    Weight scales per (h, d) output channel (axis i reduced); static mode
    folds calibrated per-i activation scales into the weight first."""
    if act_amax is None:
        xq, sx = _quantize(x, axes=None)
        wq, sw = _quantize(w, axes=0)  # [1, h, d]
        rescale = sx * sw
    else:
        xq, s_in = _quantize_act_static(x, act_amax)
        folded = w.astype(jnp.float32) * s_in[:, None, None]
        wq, rescale = _quantize(folded, axes=0)  # [1, h, d]
    y = lax.dot_general(
        xq, wq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [b, s, h, d]
    y = (y.astype(jnp.float32) * rescale).astype(out_dtype)
    return y.transpose(0, 2, 1, 3)  # -> [b, h, s, d]


def int8_merge_proj(
    ctx: jax.Array, w: jax.Array, out_dtype,
    act_amax: Optional[jax.Array] = None,
) -> jax.Array:
    """Head-merge projection [B,h,S,d] x [h*d, out] with int8 arithmetic.

    Contracts (h, d) (= einsum('bhsd,hdo->bso') on the reshaped kernel);
    weight scales per output channel."""
    b, h, s, d = ctx.shape
    x2 = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    return int8_dense(x2, w.reshape(h * d, -1), out_dtype, act_amax=act_amax)
