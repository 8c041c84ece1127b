"""Multi-head attention core.

One attention entry point serves the text self-attention, image self-attention
and the two cross-attention directions of the co-attention block (reference
BertSelfAttention vilbert/vilbert.py:396-460, BertImageSelfAttention :536-619,
BertBiAttention :697-823 — all share the same scaled-dot-product core with an
additive mask on the key axis).

TPU design notes:
- scores/softmax accumulate in fp32 regardless of the bf16 compute dtype
  (MXU accumulates fp32 natively; ``preferred_element_type`` pins it),
- the mask is an additive bias (−10000 at padded keys), precomputed once per
  batch and broadcast over heads/queries — never a boolean select in the
  hot path,
- ``impl="pallas"`` routes to a fused Pallas kernel that keeps the
  scores/probs tile resident in VMEM (no [B,h,Sq,Sk] HBM round trip).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, S, H] -> [B, h, S, H/h]."""
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, h, S, d] -> [B, S, h*d]."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _probs_from_scores(
    scores: jax.Array,
    bias: Optional[jax.Array],
    head_dim: int,
    *,
    dropout_rate: float,
    deterministic: bool,
    dropout_rng: Optional[jax.Array],
    fast_dropout: bool,
    dropout_hash: str = "murmur3",
) -> jax.Array:
    """Shared tail of both attention layouts: scale, mask-bias add, softmax,
    attention-probability dropout. One implementation keeps the head-major
    and standard paths numerically identical by construction."""
    sdt = scores.dtype
    scores = scores * jnp.asarray(1.0 / np.sqrt(head_dim), sdt)
    if bias is not None:
        scores = scores + bias.astype(sdt)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when applying attention dropout")
        if fast_dropout:
            from vilbert_tpu.ops.dropout import hash_keep_mask

            seed = jax.random.bits(dropout_rng, (), jnp.uint32)
            keep = hash_keep_mask(probs.shape, dropout_rate, seed,
                                  dropout_hash)
        else:
            keep = jax.random.bernoulli(
                dropout_rng, 1.0 - dropout_rate, probs.shape
            )
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return probs


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    *,
    num_heads: int,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    impl: str = "xla",
    return_probs: bool = False,
    fast_dropout: bool = True,
    dropout_hash: str = "murmur3",
    softmax_dtype=jnp.float32,
) -> jax.Array:
    """Scaled dot-product attention over projected inputs.

    Args:
      q: [B, Sq, H] query projections, or head-major [B, h, Sq, d]
        (from a HeadProj — the layout the attention dots want; the output
        is then also head-major and the caller folds the head merge into
        its output projection).
      k: [B, Sk, H] key projections (or [B, h, Sk, d]).
      v: [B, Sk, H] value projections (or [B, h, Sk, d]).
      bias: additive attention bias broadcastable to [B, h, Sq, Sk]
        (typically [B, 1, 1, Sk] with 0 / −10000 entries), or None.
      num_heads: number of attention heads h (H % h == 0).
      dropout_rate: attention-probability dropout (reference drops whole keys).
      impl: "xla" | "pallas".

    Returns:
      [B, Sq, H] attention output (pre output-projection), or [B, h, Sq, d]
      for head-major inputs.
    """
    if q.ndim == 4:
        # head-major fast path: plain batched dots over (B, h) — no layout
        # copies; scores/probs layout matches the 3D path ([B, h, Sq, Sk]).
        # (Deferring the projection biases into the scores algebraically was
        # tried and measured SLOWER — 1969 vs 2057 samples/s/chip — the
        # rank-1 score corrections cost more than the bias-add copies.)
        assert q.shape[1] == num_heads, (q.shape, num_heads)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.dtype(softmax_dtype),
        )
        probs = _probs_from_scores(
            scores, bias, q.shape[-1], dropout_rate=dropout_rate,
            deterministic=deterministic, dropout_rng=dropout_rng,
            fast_dropout=fast_dropout, dropout_hash=dropout_hash,
        )
        probs = probs.astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        if return_probs:
            return ctx, probs
        return ctx

    if impl == "pallas" and not return_probs:
        from vilbert_tpu.ops.pallas_attention_train import fused_attention_train

        return fused_attention_train(
            q, k, v, bias,
            num_heads=num_heads,
            dropout_rate=0.0 if deterministic else dropout_rate,
            dropout_rng=dropout_rng,
        )

    # reshape only — no explicit head transpose; letting XLA choose layouts
    # removes the bf16 [B,h,S,d] copy fusions seen in the op profile
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    qh = q.reshape(b, sq, num_heads, d)
    kh = k.reshape(b, sk, num_heads, d)
    vh = v.reshape(b, sk, num_heads, d)
    head_dim = d

    # softmax_dtype=bf16 keeps the [B,h,Sq,Sk] scores tensor and the softmax
    # passes in bf16 (half the HBM traffic, no convert in the backward). The
    # reference's fp16 apex path ran softmax in fp16 (model.half(),
    # train_concap.py:504-505), so fp32 stats here are stricter than parity
    # requires; fp32 stays the default and is always used for parity tests.
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh,
        preferred_element_type=jnp.dtype(softmax_dtype),
    )
    probs = _probs_from_scores(
        scores, bias, head_dim, dropout_rate=dropout_rate,
        deterministic=deterministic, dropout_rng=dropout_rng,
        fast_dropout=fast_dropout, dropout_hash=dropout_hash,
    )
    probs = probs.astype(vh.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    out = ctx.reshape(b, sq, hd)
    if return_probs:
        return out, probs
    return out


def make_additive_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, S] {0,1} validity mask -> [B, 1, 1, S] additive bias (0 / −10000).

    Matches the reference's extended mask construction
    (vilbert/vilbert.py:1341-1362): −10000 at padded positions.
    """
    bias = (1.0 - mask.astype(jnp.float32)) * -10000.0
    return bias[:, None, None, :].astype(dtype)
