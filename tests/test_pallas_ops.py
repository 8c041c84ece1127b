"""Pallas kernel correctness vs the XLA reference paths (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import numpy as np
import pytest


class TestFusedAttention:
    @pytest.mark.parametrize("sq,sk,h,d", [(9, 9, 4, 8), (12, 7, 2, 16)])
    def test_matches_xla_forward(self, sq, sk, h, d, rng_np):
        import jax.numpy as jnp

        from vilbert_tpu.ops.attention import attention_core, make_additive_mask
        from vilbert_tpu.ops.pallas_attention import fused_attention

        B, H = 3, h * d
        q = rng_np.randn(B, sq, H).astype(np.float32)
        k = rng_np.randn(B, sk, H).astype(np.float32)
        v = rng_np.randn(B, sk, H).astype(np.float32)
        mask = np.ones((B, sk), np.int32)
        mask[:, -2:] = 0
        bias = make_additive_mask(jnp.asarray(mask))

        ref = attention_core(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias,
            num_heads=h, impl="xla",
        )
        got = fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias,
            num_heads=h, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients_match_xla(self, rng_np):
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.ops.attention import attention_core, make_additive_mask
        from vilbert_tpu.ops.pallas_attention import fused_attention

        B, S, h, d = 2, 6, 2, 8
        H = h * d
        q = rng_np.randn(B, S, H).astype(np.float32)
        k = rng_np.randn(B, S, H).astype(np.float32)
        v = rng_np.randn(B, S, H).astype(np.float32)
        mask = np.ones((B, S), np.int32)
        mask[:, -1] = 0
        bias = make_additive_mask(jnp.asarray(mask))

        def loss_ref(q, k, v):
            return jnp.sum(
                attention_core(q, k, v, bias, num_heads=h, impl="xla") ** 2
            )

        def loss_pallas(q, k, v):
            return jnp.sum(
                fused_attention(q, k, v, bias, num_heads=h, interpret=True) ** 2
            )

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
        g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_no_bias(self, rng_np):
        import jax.numpy as jnp

        from vilbert_tpu.ops.attention import attention_core
        from vilbert_tpu.ops.pallas_attention import fused_attention

        B, S, h, d = 2, 8, 2, 8
        q = rng_np.randn(B, S, h * d).astype(np.float32)
        ref = attention_core(
            jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), None,
            num_heads=h, impl="xla",
        )
        got = fused_attention(
            jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), None,
            num_heads=h, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestFusedLayerNorm:
    def test_matches_xla(self, rng_np):
        import jax.numpy as jnp

        from vilbert_tpu.ops.layernorm import layer_norm
        from vilbert_tpu.ops.pallas_layernorm import fused_layer_norm

        x = rng_np.randn(4, 9, 32).astype(np.float32)
        res = rng_np.randn(4, 9, 32).astype(np.float32)
        w = rng_np.randn(32).astype(np.float32)
        b = rng_np.randn(32).astype(np.float32)
        ref = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                         residual=jnp.asarray(res))
        got = fused_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               residual=jnp.asarray(res), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients_match(self, rng_np):
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.ops.layernorm import layer_norm
        from vilbert_tpu.ops.pallas_layernorm import fused_layer_norm

        x = rng_np.randn(6, 16).astype(np.float32)
        res = rng_np.randn(6, 16).astype(np.float32)
        w = rng_np.randn(16).astype(np.float32)
        b = rng_np.randn(16).astype(np.float32)

        def f_ref(x, res, w, b):
            return jnp.sum(layer_norm(x, w, b, residual=res) ** 2)

        def f_pal(x, res, w, b):
            return jnp.sum(
                fused_layer_norm(x, w, b, residual=res, interpret=True) ** 2
            )

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(
            *map(jnp.asarray, (x, res, w, b))
        )
        g_pal = jax.grad(f_pal, argnums=(0, 1, 2, 3))(
            *map(jnp.asarray, (x, res, w, b))
        )
        for a, b_ in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)


class TestModelWithPallas:
    def test_model_forward_pallas_vs_xla(self, tiny_config):
        """Full model forward with Pallas kernels (interpret) == XLA path."""
        import jax

        from vilbert_tpu.models.vilbert import ViLBERTForPretraining

        ids = np.ones((2, 8), np.int32) * 3
        feats = np.random.RandomState(0).randn(2, 5, tiny_config.v_feature_size).astype(np.float32)
        locs = np.random.RandomState(1).rand(2, 5, 5).astype(np.float32)

        model_xla = ViLBERTForPretraining(tiny_config)
        params = model_xla.init(jax.random.PRNGKey(0), ids, feats, locs)
        out_xla = model_xla.apply(params, ids, feats, locs)

        cfg_p = tiny_config.replace(
            use_pallas_attention=True, use_pallas_layernorm=True
        )
        model_p = ViLBERTForPretraining(cfg_p)
        out_p = model_p.apply(params, ids, feats, locs)
        np.testing.assert_allclose(
            np.asarray(out_p.prediction_scores_t),
            np.asarray(out_xla.prediction_scores_t),
            atol=3e-4, rtol=1e-4,
        )
