"""Fused residual-add + LayerNorm Pallas TPU kernel.

Fuses the ubiquitous ``LN(x + residual)`` post-attention/post-FFN pattern
(reference BertSelfOutput/BertOutput, apex FusedLayerNorm on GPU,
vilbert/vilbert.py:297-317) into one VMEM pass with fp32 statistics.

Rows are processed in blocks; the feature dim (768/1024) fits a VMEM tile.
Backward is the standard LN VJP in XLA over the saved (x+residual).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_kernel(x_ref, res_ref, w_ref, b_ref, o_ref, *, eps: float, has_residual: bool):
    x = x_ref[:].astype(jnp.float32)
    if has_residual:
        x = x + res_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * w_ref[:].astype(jnp.float32)[None, :] + b_ref[:].astype(jnp.float32)[None, :]
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_forward(x2, res2, weight, bias, eps, interpret):
    n, h = x2.shape
    has_residual = res2 is not None
    if not has_residual:
        res2 = x2  # placeholder input, ignored by the kernel
    blk = min(_BLOCK_ROWS, n)
    grid = (pl.cdiv(n, blk),)
    kernel = functools.partial(_ln_kernel, eps=eps, has_residual=has_residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), x2.dtype),
        interpret=interpret,
    )(x2, res2, weight, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ln_core(x2, res2, weight, bias, eps, has_residual, interpret):
    return _ln_forward(x2, res2 if has_residual else None, weight, bias, eps, interpret)


def _ln_fwd(x2, res2, weight, bias, eps, has_residual, interpret):
    out = _ln_forward(x2, res2 if has_residual else None, weight, bias, eps, interpret)
    return out, (x2, res2, weight, bias)


def _ln_bwd(eps, has_residual, interpret, residuals, g):
    x2, res2, weight, bias = residuals
    x = x2.astype(jnp.float32)
    if has_residual:
        x = x + res2.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * inv
    h = x.shape[-1]
    dw = jnp.sum(g32 * xhat, axis=0)
    db = jnp.sum(g32, axis=0)
    gw = g32 * weight.astype(jnp.float32)[None, :]
    dx = inv * (
        gw
        - jnp.mean(gw, axis=-1, keepdims=True)
        - xhat * jnp.mean(gw * xhat, axis=-1, keepdims=True)
    )
    dx = dx.astype(x2.dtype)
    dres = dx if has_residual else jnp.zeros_like(res2)
    return dx, dres, dw.astype(weight.dtype), db.astype(bias.dtype)


_ln_core.defvjp(_ln_fwd, _ln_bwd)


def fused_layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-12,
    residual: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LN(x [+ residual]) over the last axis; any leading shape."""
    if interpret is None:
        interpret = _should_interpret()
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    has_residual = residual is not None
    res2 = residual.reshape(-1, shape[-1]) if has_residual else x2
    out = _ln_core(x2, res2, weight, bias, eps, has_residual, interpret)
    return out.reshape(shape)
