"""Shared building blocks: activations, LayerNorm module, transformer blocks.

Parity notes (all citations into /root/reference):
- gelu is the exact erf form (vilbert/vilbert.py:111-117); ACT2FN supports
  gelu/relu/swish (:131-138).
- LayerNorm eps is 1e-12 everywhere (vilbert/vilbert.py:304-317).
- Text block: BertLayer = MHA + residual/LN + FFN + residual/LN
  (vilbert/vilbert.py:396-533).
- Image block: BertImageLayer over v_hidden_size, with optional dynamic
  attention gating Q/K by sigmoid of the mean-pooled text embedding
  (vilbert/vilbert.py:536-694).

Module/parameter names intentionally mirror the torch attribute names
("attention.self.query", "intermediate.dense", ...) so checkpoint import is a
mechanical path mapping (see vilbert_tpu.core.importer).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vilbert_tpu.core.config import ModelConfig
from vilbert_tpu.ops.attention import attention_core
from vilbert_tpu.ops.layernorm import layer_norm


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) gelu — matches the reference's non-approximate form."""
    return jax.nn.gelu(x, approximate=False)


# Minimax rational for erf(z) ~ z * P(z^2)/Q(z^2) on |z| <= 3.2
# (fit on Chebyshev-style weighted grid; max abs error 9.7e-6, two decades
# below bf16 half-ulp ~2e-3). erf(3.2) = 0.9999984 rounds to 1.0 in bf16,
# so clamping |z| at 3.2 is exact at bf16 precision too.
_ERF_P = (1.1283621227654328, 0.15780611964408517,
          0.043127602475218844, 0.0007360894735171213)
_ERF_Q = (1.0, 0.47307127867236537,
          0.09602493287758253, 0.009191308867243501)

# gelu'(x) - 0.5 is odd (gelu'(x) + gelu'(-x) = 1), so the derivative gets
# its own rational: gelu'(x) ~ 0.5 + x * DP(x^2)/DQ(x^2) on |x| <= 5
# (max abs err 5.0e-4 — below the bf16 cotangent rounding it feeds).
# A custom JVP with this form keeps the backward a straight-line rational;
# plain autodiff through gelu_rational recomputes p, q and the quotient
# rule inside the dW/dX fusions — measured: it moved the 5 ms the forward
# saved INTO the backward FFN fusions (bwd output_dense 6.1 -> 11.7 ms).
_DGELU_P = (0.7986929677932244, -0.03807846651247695,
            0.015090213881573151, 0.00019122776191594145)
_DGELU_Q = (1.0, 0.2926936920714664,
            0.03245537653061185, 0.006019591148099333)


def _horner(coeffs, u):
    acc = coeffs[-1]
    for c in coeffs[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return acc


@jax.custom_jvp
def gelu_rational(x: jax.Array) -> jax.Array:
    """gelu with erf evaluated by a short P3/Q3 rational approximation.

    Numerically: |erf_approx - erf| < 1e-5 in f32, and at bf16 precision
    this is MORE accurate than jax.nn.gelu's exact-erf path (which loses
    several ulps to internal bf16 roundings): measured against the
    correctly-rounded true gelu it lands within 1 ulp or 5e-5 absolute
    everywhere and is bitwise-correct more often (78% vs 57%);
    tests/test_encoder_modes.py::TestGeluRational pins the claims.

    Why it exists: XLA:TPU expands `erf` into a ~30-op branchy f32 erfc
    polynomial fused into the FFN GEMM epilogue — the roofline table
    (scripts/roofline.py, docs/perf.md) showed the forward FFN GEMMs
    running at 42% of their MXU bound because of it. The rational form is
    ~14 straight-line VPU ops, and the custom JVP below keeps the backward
    an equally short rational (gelu' directly, via the odd-symmetry
    gelu'(x) = 0.5 + odd(x)) instead of autodiff's recompute+quotient-rule
    graph, which measured SLOWER than the erfc baseline inside the dW/dX
    fusions.
    """
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    z = jnp.clip(x32 * jnp.float32(0.7071067811865476), -3.2, 3.2)
    u = z * z
    erf = z * _horner(_ERF_P, u) / _horner(_ERF_Q, u)
    return (jnp.float32(0.5) * x32 * (jnp.float32(1.0) + erf)).astype(dt)


@gelu_rational.defjvp
def _gelu_rational_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = gelu_rational(x)
    x32 = x.astype(jnp.float32)
    s = jnp.clip(x32, -5.0, 5.0)
    u = s * s
    dgelu = jnp.float32(0.5) + s * _horner(_DGELU_P, u) / _horner(_DGELU_Q, u)
    return y, (dgelu.astype(x.dtype) * dx).astype(x.dtype)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


ACT2FN: dict[str, Callable[[jax.Array], jax.Array]] = {
    "gelu": gelu,
    "gelu_rational": gelu_rational,
    "relu": jax.nn.relu,
    "swish": swish,
}


def resolve_act(name: str, cfg: "ModelConfig") -> Callable[[jax.Array], jax.Array]:
    """Map an activation name through the config's gelu_impl policy.

    gelu_impl="auto" uses the rational erf under bf16 compute (bf16-exact,
    see gelu_rational) and the exact erf under fp32 — same convention as
    softmax_dtype="auto". "exact"/"rational" force one implementation.
    """
    if name == "gelu" and cfg.resolved_gelu_impl == "rational":
        return gelu_rational
    return ACT2FN[name]


class LayerNorm(nn.Module):
    """TF-style LayerNorm with params named weight/bias (torch convention)."""

    epsilon: float = 1e-12
    impl: str = "xla"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, residual: Optional[jax.Array] = None
    ) -> jax.Array:
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        return layer_norm(
            x, weight, bias, eps=self.epsilon, impl=self.impl, residual=residual
        )


def _int8_act_amax(mod: nn.Module, x: jax.Array, in_dim: int):
    """Static-int8 per-channel activation range for this site.

    Lives in the ``quant`` variable collection (one [in]-vector per
    quantized site, addressed by the module path). Behavior follows the
    collection's mutability:

    - calibration pass (``apply(..., mutable=["quant"])``): accumulate the
      running per-channel abs-max over the calibration batches and return
      None — the site computes with DYNAMIC scales while observing;
    - inference (``apply({"params": ..., "quant": calibrated})``): return
      the calibrated vector — the site quantizes with fixed scales and
      skips the per-call abs-max reduction.
    """
    v = mod.variable(
        "quant", "act_amax", lambda: jnp.zeros((in_dim,), jnp.float32)
    )
    if mod.is_mutable_collection("quant"):
        obs = jnp.max(
            jnp.abs(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1))
        )
        v.value = jnp.maximum(v.value, obs)
        return None
    return v.value


class QuantDense(nn.Module):
    """nn.Dense-compatible layer computing y = int8(x) @ int8(kernel) + bias.

    Param tree identical to nn.Dense (kernel [in, features], bias) so
    checkpoints round-trip unchanged; only the arithmetic differs
    (ops/quant.py — inference-only int8, dynamic or calibrated static)."""

    features: int
    config: ModelConfig
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vilbert_tpu.ops.quant import int8_dense

        cfg = self.config
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev=cfg.initializer_range),
            (x.shape[-1], self.features), jnp.dtype(cfg.param_dtype),
        )
        amax = (
            _int8_act_amax(self, x, x.shape[-1]) if cfg.int8_static else None
        )
        y = int8_dense(x, kernel, jnp.dtype(cfg.compute_dtype), act_amax=amax)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.dtype(cfg.param_dtype),
            )
            y = y + bias.astype(y.dtype)
        return y


def _dense(cfg: ModelConfig, features: int, name: str, use_bias: bool = True):
    if cfg.int8_enabled:
        return QuantDense(features, cfg, use_bias=use_bias, name=name)
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype),
        kernel_init=nn.initializers.normal(stddev=cfg.initializer_range),
        name=name,
    )


def _ln(cfg: ModelConfig, name: str = "LayerNorm"):
    impl = "pallas" if cfg.use_pallas_layernorm else "xla"
    return LayerNorm(impl=impl, param_dtype=jnp.dtype(cfg.param_dtype), name=name)


def _dropout(cfg: ModelConfig, rate: float, name: Optional[str] = None):
    """Config-selected dropout: counter-hash (fast) or flax threefry."""
    if cfg.use_fast_dropout:
        from vilbert_tpu.ops.dropout import FastDropout

        return FastDropout(rate, variant=cfg.dropout_hash, name=name)
    return nn.Dropout(rate, name=name)


class ProjParams(nn.Module):
    """Declares a Dense-compatible (kernel, bias) pair without computing.

    Lets SelfAttention keep the torch-mirroring param tree
    (attention_self.{query,key,value}.{kernel,bias}) while the projections
    execute as ONE fused matmul."""

    in_dim: int
    out_dim: int
    kernel_init: Any
    param_dtype: Any

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_dim, self.out_dim),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_dim,), self.param_dtype
        )
        return kernel, bias


class HeadProj(nn.Module):
    """Dense-compatible projection emitting head-major [B, h, S, d] directly.

    Params are exactly nn.Dense's (kernel [in, H], bias [H]) so checkpoints
    round-trip unchanged; the head split is folded into the projection
    einsum so the GEMM writes the layout the attention dots consume — no
    [B,S,H] -> [B,h,S,d] reshape/transpose copies in the compiled step
    (~12 ms/step of pure layout copies in the round-2 profile, docs/perf.md).
    """

    features: int
    num_heads: int
    config: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=cfg.initializer_range),
            (x.shape[-1], self.features),
            jnp.dtype(cfg.param_dtype),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,),
            jnp.dtype(cfg.param_dtype),
        )
        h = self.num_heads
        d = self.features // h
        cdtype = jnp.dtype(cfg.compute_dtype)
        if cfg.int8_enabled:
            from vilbert_tpu.ops.quant import int8_head_proj

            w = kernel.reshape(x.shape[-1], h, d)
            b = bias.reshape(h, d).astype(cdtype)
            amax = (
                _int8_act_amax(self, x, x.shape[-1])
                if cfg.int8_static else None
            )
            return int8_head_proj(x, w, cdtype, act_amax=amax) \
                + b[None, :, None, :]
        if cfg.proj_impl == "gemm":
            # plain 2D GEMM (bias fused in its epilogue) + ONE transpose to
            # head-major: autodiff's backward transposes the cotangent back
            # ONCE and both dX and dW are then copy-free 2D GEMMs.
            # Measured 6% slower than the einsum (docs/perf.md).
            B, S, _ = x.shape
            y = x.astype(cdtype) @ kernel.astype(cdtype) + bias.astype(cdtype)
            return y.reshape(B, S, h, d).transpose(0, 2, 1, 3)
        if cfg.proj_impl == "custom_bwd":
            from vilbert_tpu.ops.proj import head_proj_op

            return head_proj_op(
                x.astype(cdtype), kernel.astype(cdtype), bias.astype(cdtype), h
            )
        w = kernel.reshape(x.shape[-1], h, d).astype(cdtype)
        b = bias.reshape(h, d).astype(cdtype)
        return (
            jnp.einsum("bsi,ihd->bhsd", x.astype(cdtype), w)
            + b[None, :, None, :]
        )


class SelfAttention(nn.Module):
    """Q/K/V projection + attention core. Serves both streams.

    hidden size / head count are passed explicitly so the same module covers
    the text stream (hidden_size, num_attention_heads) and the image stream
    (v_hidden_size, v_num_attention_heads).

    Projection variants (all keep the torch-mirroring param tree, so
    checkpoint import/export is unchanged):
    - default: head-major HeadProj per q/k/v (fastest measured; docs/perf.md),
    - ``fused_qkv``: one [D, 3H] GEMM (measured slower at these shapes),
    - fallback: three nn.Dense (used under the Pallas kernel path).
    """

    config: ModelConfig
    hidden_size: int
    num_heads: int
    dropout_rate: float
    dynamic: bool = False  # image-stream dynamic attention gates

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        attention_bias: jax.Array,
        *,
        deterministic: bool = True,
        txt_embedding: Optional[jax.Array] = None,
        txt_mask2: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        if cfg.fused_qkv:
            init = nn.initializers.normal(stddev=cfg.initializer_range)
            pdtype = jnp.dtype(cfg.param_dtype)
            in_dim = hidden_states.shape[-1]
            pairs = [
                ProjParams(in_dim, self.hidden_size, init, pdtype, name=nm)()
                for nm in ("query", "key", "value")
            ]
            cdtype = jnp.dtype(cfg.compute_dtype)
            w = jnp.concatenate([p[0] for p in pairs], axis=1).astype(cdtype)
            b = jnp.concatenate([p[1] for p in pairs]).astype(cdtype)
            qkv = hidden_states.astype(cdtype) @ w + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif cfg.head_major_attention and not cfg.use_pallas_attention:
            hp = lambda nm: HeadProj(
                self.hidden_size, self.num_heads, cfg, name=nm
            )(hidden_states)
            q, k, v = hp("query"), hp("key"), hp("value")
        else:
            q = _dense(cfg, self.hidden_size, "query")(hidden_states)
            k = _dense(cfg, self.hidden_size, "key")(hidden_states)
            v = _dense(cfg, self.hidden_size, "value")(hidden_states)

        if self.dynamic:
            # Dynamic attention (vilbert/vilbert.py:577-586): gate Q/K with
            # 1 + sigmoid(Linear(mean-pooled text embedding)).
            assert txt_embedding is not None and txt_mask2 is not None
            pooled = jnp.sum(txt_embedding * txt_mask2, axis=1) / jnp.sum(
                txt_mask2, axis=1
            )
            gate_q = 1.0 + jax.nn.sigmoid(
                _dense(cfg, self.hidden_size, "dyLinear_q")(pooled)
            )
            gate_k = 1.0 + jax.nn.sigmoid(
                _dense(cfg, self.hidden_size, "dyLinear_k")(pooled)
            )
            if q.ndim == 4:  # head-major [B, h, S, d]
                b_, h_, _, d_ = q.shape
                q = q * gate_q.reshape(b_, h_, 1, d_)
                k = k * gate_k.reshape(b_, h_, 1, d_)
            else:
                q = q * gate_q[:, None, :]
                k = k * gate_k[:, None, :]

        dropout_rng = None
        if not deterministic and self.dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")
        impl = "pallas" if cfg.use_pallas_attention else "xla"
        out = attention_core(
            q,
            k,
            v,
            attention_bias,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
            impl=impl,
            return_probs=cfg.visualization,
            fast_dropout=cfg.use_fast_dropout,
            dropout_hash=cfg.dropout_hash,
            softmax_dtype=cfg.resolved_softmax_dtype,
        )
        if cfg.visualization:
            out, probs = out
            # attention-map capture (reference `visualization` flag,
            # vilbert.py:451-458) — read via flax capture_intermediates
            self.sow("intermediates", "attention_probs", probs)
        return out


class MergeProj(nn.Module):
    """Dense-compatible output projection over a head-major [B, h, S, d]
    context: contracts (h, d) in one einsum so the head merge rides the GEMM
    instead of a layout copy. Params identical to nn.Dense([h*d, features])."""

    config: ModelConfig
    features: int

    @nn.compact
    def __call__(self, ctx: jax.Array) -> jax.Array:
        cfg = self.config
        _, h, _, d = ctx.shape
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=cfg.initializer_range),
            (h * d, self.features),
            jnp.dtype(cfg.param_dtype),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,),
            jnp.dtype(cfg.param_dtype),
        )
        cdtype = jnp.dtype(cfg.compute_dtype)
        if cfg.int8_enabled:
            from vilbert_tpu.ops.quant import int8_merge_proj

            amax = None
            if cfg.int8_static:
                _, h_, _, d_ = ctx.shape
                x2 = ctx.transpose(0, 2, 1, 3).reshape(
                    ctx.shape[0], ctx.shape[2], h_ * d_
                )
                amax = _int8_act_amax(self, x2, h_ * d_)
            return int8_merge_proj(ctx, kernel, cdtype, act_amax=amax) \
                + bias.astype(cdtype)
        if cfg.proj_impl == "gemm":
            B, _, S, _ = ctx.shape
            t = ctx.transpose(0, 2, 1, 3).reshape(B * S, h * d)
            y = t @ kernel.astype(cdtype) + bias.astype(cdtype)
            return y.reshape(B, S, self.features)
        if cfg.proj_impl == "custom_bwd":
            from vilbert_tpu.ops.proj import merge_proj_op

            return merge_proj_op(
                ctx, kernel.astype(cdtype), bias.astype(cdtype), self.features
            )
        w = kernel.reshape(h, d, self.features).astype(cdtype)
        return jnp.einsum("bhsd,hdo->bso", ctx, w) + bias.astype(cdtype)


class AttentionOutput(nn.Module):
    """dense -> dropout -> LN(x + input) (reference BertSelfOutput)."""

    config: ModelConfig
    hidden_size: int
    dropout_rate: float

    @nn.compact
    def __call__(
        self, hidden_states: jax.Array, input_tensor: jax.Array, *, deterministic=True
    ) -> jax.Array:
        cfg = self.config
        if hidden_states.ndim == 4:
            # head-major context from attention_core: fold the head merge
            # into the output projection (no [B,h,S,d]->[B,S,H] copy)
            h = MergeProj(cfg, self.hidden_size, name="dense")(hidden_states)
        else:
            h = _dense(cfg, self.hidden_size, "dense")(hidden_states)
        h = _dropout(self.config, self.dropout_rate)(h, deterministic=deterministic)
        return _ln(cfg)(h, residual=input_tensor)


class FeedForward(nn.Module):
    """intermediate dense+act then output dense+dropout+LN(residual).

    Covers reference BertIntermediate/BertOutput and the image variants.
    """

    config: ModelConfig
    hidden_size: int
    intermediate_size: int
    act: str
    dropout_rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic=True) -> jax.Array:
        cfg = self.config
        h = _dense(cfg, self.intermediate_size, "intermediate_dense")(x)
        h = resolve_act(self.act, cfg)(h)
        h = _dense(cfg, self.hidden_size, "output_dense")(h)
        h = _dropout(self.config, self.dropout_rate)(h, deterministic=deterministic)
        return _ln(cfg)(h, residual=x)


class TextLayer(nn.Module):
    """One text-stream transformer block (reference BertLayer, vilbert.py:520)."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self, hidden_states: jax.Array, attention_bias: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        # deterministic is positional-or-keyword so nn.remat can treat it as
        # a static argument (TwoStreamEncoder passes it positionally)
        cfg = self.config
        attn = SelfAttention(
            cfg,
            cfg.hidden_size,
            cfg.num_attention_heads,
            cfg.attention_probs_dropout_prob,
            name="attention_self",
        )(hidden_states, attention_bias, deterministic=deterministic)
        attn_out = AttentionOutput(
            cfg, cfg.hidden_size, cfg.hidden_dropout_prob, name="attention_output"
        )(attn, hidden_states, deterministic=deterministic)
        return FeedForward(
            cfg,
            cfg.hidden_size,
            cfg.intermediate_size,
            cfg.hidden_act,
            cfg.hidden_dropout_prob,
            name="ffn",
        )(attn_out, deterministic=deterministic)


class ImageLayer(nn.Module):
    """One image-stream block (reference BertImageLayer, vilbert.py:681)."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        attention_bias: jax.Array,
        txt_embedding: jax.Array,
        txt_mask2: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        attn = SelfAttention(
            cfg,
            cfg.v_hidden_size,
            cfg.v_num_attention_heads,
            cfg.v_attention_probs_dropout_prob,
            dynamic=cfg.dynamic_attention,
            name="attention_self",
        )(
            hidden_states,
            attention_bias,
            deterministic=deterministic,
            txt_embedding=txt_embedding,
            txt_mask2=txt_mask2,
        )
        attn_out = AttentionOutput(
            cfg, cfg.v_hidden_size, cfg.v_hidden_dropout_prob, name="attention_output"
        )(attn, hidden_states, deterministic=deterministic)
        return FeedForward(
            cfg,
            cfg.v_hidden_size,
            cfg.v_intermediate_size,
            cfg.v_hidden_act,
            cfg.v_hidden_dropout_prob,
            name="ffn",
        )(attn_out, deterministic=deterministic)
