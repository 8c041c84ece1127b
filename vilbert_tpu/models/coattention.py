"""Co-attentional transformer block (Co-TRM).

Reference: BertBiAttention (vilbert/vilbert.py:697-823), BertBiOutput
(:826-855), BertConnectionLayer (:858-900).

Semantics (stream 1 = vision, stream 2 = text, as in the reference):
- text queries attend image keys/values  -> text-side context  ("context1"),
- image queries attend text keys/values  -> image-side context ("context2"),
- BiOutput projects each context back to its stream width and applies
  dropout + residual + LN, then each stream gets its own FFN.

Quirks preserved:
- the reference's ``q_dense1``/``q_dense2`` weights are dead code (declared,
  never used in forward, vilbert.py:834-842) — we do not create them; the
  checkpoint importer skips them.
- the co_attention_mask input is accepted for API parity but — exactly like
  the reference, where the additions at vilbert.py:774-775/796-797 are
  commented out — it never modifies the attention scores.
- note ``bi_intermediate_size`` is unused by the reference connection layer:
  the per-stream FFNs reuse intermediate_size / v_intermediate_size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vilbert_tpu.core.config import ModelConfig
from vilbert_tpu.models.layers import AttentionOutput, FeedForward, _dense, _dropout, _ln
from vilbert_tpu.ops.attention import attention_core


class BiAttention(nn.Module):
    """The two cross-attention directions sharing one projection set."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        input_v: jax.Array,      # [B, R, v_hidden]
        bias_v: jax.Array,       # additive image-key bias [B,1,1,R]
        input_t: jax.Array,      # [B, T, hidden]
        bias_t: jax.Array,       # additive text-key bias [B,1,1,T]
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        bi = cfg.bi_hidden_size

        if cfg.fused_qkv:
            # one [D,3*bi] GEMM per stream (param tree unchanged — see
            # layers.SelfAttention)
            from vilbert_tpu.models.layers import ProjParams

            init = nn.initializers.normal(stddev=cfg.initializer_range)
            pdtype = jnp.dtype(cfg.param_dtype)
            cdtype = jnp.dtype(cfg.compute_dtype)

            def fused(x, names):
                pairs = [
                    ProjParams(x.shape[-1], bi, init, pdtype, name=nm)()
                    for nm in names
                ]
                w = jnp.concatenate([p[0] for p in pairs], axis=1).astype(cdtype)
                b = jnp.concatenate([p[1] for p in pairs]).astype(cdtype)
                return jnp.split(x.astype(cdtype) @ w + b, 3, axis=-1)

            q1, k1, v1 = fused(input_v, ("query1", "key1", "value1"))
            q2, k2, v2 = fused(input_t, ("query2", "key2", "value2"))
        elif cfg.head_major_attention and not cfg.use_pallas_attention:
            from vilbert_tpu.models.layers import HeadProj

            hp = lambda x, nm: HeadProj(
                bi, cfg.bi_num_attention_heads, cfg, name=nm
            )(x)
            q1, k1, v1 = hp(input_v, "query1"), hp(input_v, "key1"), hp(input_v, "value1")
            q2, k2, v2 = hp(input_t, "query2"), hp(input_t, "key2"), hp(input_t, "value2")
        else:
            q1 = _dense(cfg, bi, "query1")(input_v)
            k1 = _dense(cfg, bi, "key1")(input_v)
            v1 = _dense(cfg, bi, "value1")(input_v)
            q2 = _dense(cfg, bi, "query2")(input_t)
            k2 = _dense(cfg, bi, "key2")(input_t)
            v2 = _dense(cfg, bi, "value2")(input_t)

        impl = "pallas" if cfg.use_pallas_attention else "xla"

        def rng(rate):
            if not deterministic and rate > 0.0:
                return self.make_rng("dropout")
            return None

        # text queries -> image keys/values (text-side context)
        context_t = attention_core(
            q2, k1, v1, bias_v,
            num_heads=cfg.bi_num_attention_heads,
            dropout_rate=cfg.v_attention_probs_dropout_prob,
            deterministic=deterministic,
            dropout_rng=rng(cfg.v_attention_probs_dropout_prob),
            impl=impl,
            return_probs=cfg.visualization,
            fast_dropout=cfg.use_fast_dropout,
            dropout_hash=cfg.dropout_hash,
            softmax_dtype=cfg.resolved_softmax_dtype,
        )
        # image queries -> text keys/values (image-side context)
        context_v = attention_core(
            q1, k2, v2, bias_t,
            num_heads=cfg.bi_num_attention_heads,
            dropout_rate=cfg.attention_probs_dropout_prob,
            deterministic=deterministic,
            dropout_rng=rng(cfg.attention_probs_dropout_prob),
            impl=impl,
            return_probs=cfg.visualization,
            fast_dropout=cfg.use_fast_dropout,
            dropout_hash=cfg.dropout_hash,
            softmax_dtype=cfg.resolved_softmax_dtype,
        )
        if cfg.visualization:
            context_t, probs_t = context_t
            context_v, probs_v = context_v
            # co-attention maps (reference attn1/attn2, vilbert.py:813-821)
            self.sow("intermediates", "attention_probs", probs_t)
            self.sow("intermediates", "attention_probs_v", probs_v)
        return context_v, context_t


class BiOutput(nn.Module):
    """Project each context to its stream width, dropout + residual + LN."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        context_v: jax.Array,
        input_v: jax.Array,
        context_t: jax.Array,
        input_t: jax.Array,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        if context_v.ndim == 4:  # head-major contexts (see layers.MergeProj)
            from vilbert_tpu.models.layers import MergeProj

            hv = MergeProj(cfg, cfg.v_hidden_size, name="dense1")(context_v)
            ht = MergeProj(cfg, cfg.hidden_size, name="dense2")(context_t)
        else:
            hv = _dense(cfg, cfg.v_hidden_size, "dense1")(context_v)
            ht = _dense(cfg, cfg.hidden_size, "dense2")(context_t)
        hv = _dropout(cfg, cfg.v_hidden_dropout_prob)(hv, deterministic=deterministic)
        out_v = _ln(cfg, "LayerNorm1")(hv, residual=input_v)

        ht = _dropout(cfg, cfg.hidden_dropout_prob)(ht, deterministic=deterministic)
        out_t = _ln(cfg, "LayerNorm2")(ht, residual=input_t)
        return out_v, out_t


class ConnectionLayer(nn.Module):
    """BiAttention + BiOutput + per-stream FFN (reference BertConnectionLayer)."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        input_v: jax.Array,
        bias_v: jax.Array,
        input_t: jax.Array,
        bias_t: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        context_v, context_t = BiAttention(cfg, name="biattention")(
            input_v, bias_v, input_t, bias_t, deterministic=deterministic
        )
        attn_v, attn_t = BiOutput(cfg, name="biOutput")(
            context_v, input_v, context_t, input_t, deterministic=deterministic
        )
        out_v = FeedForward(
            cfg,
            cfg.v_hidden_size,
            cfg.v_intermediate_size,
            cfg.v_hidden_act,
            cfg.v_hidden_dropout_prob,
            name="v_ffn",
        )(attn_v, deterministic=deterministic)
        out_t = FeedForward(
            cfg,
            cfg.hidden_size,
            cfg.intermediate_size,
            cfg.hidden_act,
            cfg.hidden_dropout_prob,
            name="t_ffn",
        )(attn_t, deterministic=deterministic)
        return out_v, out_t
