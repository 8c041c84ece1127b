"""Head-major projection with a single-relayout custom backward.

The forward is EXACTLY HeadProj's folded einsum — ``bsi,ihd->bhsd`` — whose
dot emits the head-major layout the attention cores consume with no copy.
Autodiff of that einsum, however, makes XLA materialize TWO different
relayouts of the [B,h,S,d] cotangent (one feeding the dW dot as
[h,d,(B·S)], one feeding the dX dot with (h,d) minor) — measured ~6.8 GB of
pure layout-copy traffic per bench step (scripts/inspect_hlo.py histogram).

The custom VJP here transposes the cotangent ONCE to [(B·S), (h·d)] and
expresses dX, dW and db as plain 2D GEMMs / a row reduction over that single
tensor — the layouts every dot wants, so no further copies.

Reference provenance: these projections implement BertSelfAttention's
query/key/value (reference vilbert/vilbert.py:220-260); the math is
unchanged, only the backward schedule differs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def head_proj_op(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                 num_heads: int) -> jax.Array:
    """x [B,S,I] @ kernel [I,H] (+ bias [H]) emitted head-major [B,h,S,d].

    All operands must already be in the compute dtype; gradients are
    returned in that dtype (the caller's ``astype`` boundary converts to the
    param dtype, which is where a bf16→f32 write lands unless bf16 gradient
    storage is on).
    """
    h = num_heads
    i, H = kernel.shape
    w = kernel.reshape(i, h, H // h)
    b = bias.reshape(h, H // h)
    return jnp.einsum("bsi,ihd->bhsd", x, w) + b[None, :, None, :]


def _head_proj_fwd(x, kernel, bias, num_heads):
    return head_proj_op(x, kernel, bias, num_heads), (x, kernel)


def _head_proj_bwd(num_heads, res, dy):
    x, kernel = res
    B, h, S, d = dy.shape
    t = dy.transpose(0, 2, 1, 3).reshape(B * S, h * d)  # the ONE relayout
    x2 = x.reshape(B * S, x.shape[-1])
    dx = (t @ kernel.T).reshape(x.shape)
    dw = x2.T @ t
    db = t.sum(0)
    return dx, dw, db


head_proj_op.defvjp(_head_proj_fwd, _head_proj_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def merge_proj_op(ctx: jax.Array, kernel: jax.Array, bias: jax.Array,
                  features: int) -> jax.Array:
    """Head-merging output projection: ctx [B,h,S,d] → [B,S,features].

    Forward identical to MergeProj's ``bhsd,hdo->bso`` einsum; the backward
    computes dctx as the same head-major-emitting dot the forward pass of
    head_proj_op uses (copy-free) and pays ONE relayout of the saved ctx
    residual for dW.
    """
    _, h, _, d = ctx.shape
    w = kernel.reshape(h, d, features)
    return jnp.einsum("bhsd,hdo->bso", ctx, w) + bias


def _merge_proj_fwd(ctx, kernel, bias, features):
    return merge_proj_op(ctx, kernel, bias, features), (ctx, kernel)


def _merge_proj_bwd(features, res, dy):
    ctx, kernel = res
    B, h, S, d = ctx.shape
    dy2 = dy.reshape(B * S, features)
    # dctx: same bsi,ihd->bhsd dot shape as the forward projection — the dot
    # emits head-major directly, no relayout of dy needed
    dctx = jnp.einsum("bso,ohd->bhsd", dy, kernel.reshape(h * d, features).T
                      .reshape(features, h, d))
    c2 = ctx.transpose(0, 2, 1, 3).reshape(B * S, h * d)  # ONE ctx relayout
    dw = c2.T @ dy2
    db = dy2.sum(0)
    return dctx, dw, db


merge_proj_op.defvjp(_merge_proj_fwd, _merge_proj_bwd)
