"""Fused attention Pallas TPU kernel.

Fuses QK^T · scale + mask-bias, softmax, and PV into one VMEM-resident
kernel — the attention probabilities ([B,h,Sq,Sk] fp32) never round-trip to
HBM. ViLBERT's sequences are short (text ≤37 tokens with the task token,
≤306 regions; SURVEY.md §5 long-context: N/A), so each (batch, head) tile
fits comfortably in VMEM and there is no need for online-softmax streaming —
this is the "small-S flash attention" regime.

The backward pass recomputes probabilities in XLA (standard softmax-attention
VJP); the forward saves only (q, k, v, bias) — same memory profile as flash
attention's recompute strategy.

Layout: heads are folded into the grid — grid (B*h,), blocks
q [Sq, d], k/v [Sk, d], bias [Sk] broadcast over heads/queries.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)          # [Sq, d]
    k = k_ref[0].astype(jnp.float32)          # [Sk, d]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # [Sq, Sk]
    s = s + bias_ref[0, 0][None, :].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )                                          # [Sq, d]
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_fwd_pallas(qh, kh, vh, bias_rows, num_heads, interpret):
    """qh/kh/vh: [B*h, S, d]; bias_rows: [B, Sk] additive."""
    bh, sq, d = qh.shape
    sk = kh.shape[1]
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, sk), lambda i: (i // num_heads, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), qh.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * sq * sk * d * 2,
            bytes_accessed=(qh.size + kh.size + vh.size) * qh.dtype.itemsize * 2,
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )(qh, kh, vh, bias_rows[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_core_folded(qh, kh, vh, bias_rows, num_heads, interpret):
    return _attention_fwd_pallas(qh, kh, vh, bias_rows, num_heads, interpret)


def _folded_fwd(qh, kh, vh, bias_rows, num_heads, interpret):
    out = _attention_fwd_pallas(qh, kh, vh, bias_rows, num_heads, interpret)
    return out, (qh, kh, vh, bias_rows)


def _folded_bwd(num_heads, interpret, residuals, g):
    qh, kh, vh, bias_rows = residuals
    d = qh.shape[-1]
    scale = 1.0 / (d ** 0.5)
    q32, k32, v32 = (x.astype(jnp.float32) for x in (qh, kh, vh))
    bias = jnp.repeat(bias_rows.astype(jnp.float32), num_heads, axis=0)
    s = jnp.einsum("bqd,bkd->bqk", q32, k32, preferred_element_type=jnp.float32)
    s = s * scale + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqd->bkd", p, g32, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqd,bkd->bqk", g32, v32, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, k32) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, q32) * scale
    return (
        dq.astype(qh.dtype),
        dk.astype(kh.dtype),
        dv.astype(vh.dtype),
        jnp.zeros_like(bias_rows),  # mask bias is a constant
    )


_attention_core_folded.defvjp(_folded_fwd, _folded_bwd)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    *,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for the XLA path of ops.attention.attention_core.

    q: [B, Sq, H], k/v: [B, Sk, H], bias: [B, 1, 1, Sk] additive (or None).
    Returns [B, Sq, H].
    """
    if interpret is None:
        interpret = _should_interpret()
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
    out = _attention_core_folded(qh, kh, vh, bias_rows, num_heads, interpret)
    return (
        out.reshape(b, num_heads, sq, d).transpose(0, 2, 1, 3).reshape(b, sq, hdim)
    )
