"""LayerNorm (TF-style, eps inside the sqrt) — the reference's BertLayerNorm.

The reference uses apex FusedLayerNorm on GPU with a pure-torch fallback
(vilbert/vilbert.py:297-317). On TPU, XLA fuses layernorm into surrounding
elementwise work already; a Pallas kernel is provided for the cases where we
want LN fused with the residual add in one VMEM pass (``impl="pallas"``).

Statistics are always computed in fp32 (bf16 mean/variance loses too much
precision at hidden sizes 768–1024).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-12,
    impl: str = "xla",
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """y = weight * (x - mean) / sqrt(var + eps) + bias, over the last axis.

    If ``residual`` is given, computes LN(x + residual) — the ubiquitous
    post-attention/post-FFN pattern (reference BertSelfOutput/BertOutput).
    """
    if impl == "pallas":
        from vilbert_tpu.ops.pallas_layernorm import fused_layer_norm

        return fused_layer_norm(x, weight, bias, eps=eps, residual=residual)

    if residual is not None:
        x = x + residual
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)
