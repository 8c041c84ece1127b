"""Trainable fused attention (in-kernel dropout) correctness tests."""

import numpy as np
import pytest


def _qkv(rng_np, B=2, S=6, h=2, d=8):
    H = h * d
    return (
        rng_np.randn(B, S, H).astype(np.float32),
        rng_np.randn(B, S, H).astype(np.float32),
        rng_np.randn(B, S, H).astype(np.float32),
    )


class TestFusedAttentionTrain:
    def test_no_dropout_matches_xla_fwd_bwd(self, rng_np):
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.ops.attention import attention_core, make_additive_mask
        from vilbert_tpu.ops.pallas_attention_train import fused_attention_train

        q, k, v = _qkv(rng_np)
        mask = np.ones((2, 6), np.int32); mask[:, -1] = 0
        bias = make_additive_mask(jnp.asarray(mask))

        def loss_ref(q, k, v):
            return jnp.sum(attention_core(q, k, v, bias, num_heads=2) ** 2)

        def loss_pal(q, k, v):
            return jnp.sum(
                fused_attention_train(q, k, v, bias, num_heads=2,
                                      interpret=True) ** 2
            )

        args = tuple(map(jnp.asarray, (q, k, v)))
        np.testing.assert_allclose(
            float(loss_ref(*args)), float(loss_pal(*args)), rtol=1e-5
        )
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(*args)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_dropout_statistics_and_determinism(self, rng_np):
        """Dropout keeps ~ (1-rate) of keys, is deterministic per seed, and
        differs across seeds."""
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.ops.pallas_attention_train import fused_attention_train

        B, S, h, d = 2, 8, 2, 8
        q, k, _ = _qkv(rng_np, B, S, h, d)
        # v = identity-ish rows so output magnitude tracks kept mass
        v = np.tile(np.ones((1, S, h * d), np.float32), (B, 1, 1))
        rate = 0.5

        out1 = fused_attention_train(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None,
            num_heads=h, dropout_rate=rate,
            dropout_rng=jax.random.PRNGKey(7), interpret=True,
        )
        out2 = fused_attention_train(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None,
            num_heads=h, dropout_rate=rate,
            dropout_rng=jax.random.PRNGKey(7), interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        out3 = fused_attention_train(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None,
            num_heads=h, dropout_rate=rate,
            dropout_rng=jax.random.PRNGKey(8), interpret=True,
        )
        assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0
        # with all-ones V, E[out] = 1 under dropout rescaling
        assert 0.5 < float(np.mean(np.asarray(out1))) < 1.8

    def test_dropout_backward_uses_same_mask(self, rng_np):
        """grad through the kernel must see the identical mask: for all-ones
        V and sum-output loss, d(out)/d(v_j) = sum of kept+rescaled probs at
        key j — finite and consistent between two identical calls."""
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.ops.pallas_attention_train import fused_attention_train

        q, k, v = _qkv(rng_np)

        def loss(v_):
            out = fused_attention_train(
                jnp.asarray(q), jnp.asarray(k), v_, None, num_heads=2,
                dropout_rate=0.3, dropout_rng=jax.random.PRNGKey(3),
                interpret=True,
            )
            return jnp.sum(out ** 2)

        g1 = jax.grad(loss)(jnp.asarray(v))
        g2 = jax.grad(loss)(jnp.asarray(v))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        assert np.isfinite(np.asarray(g1)).all()

    @pytest.mark.slow
    def test_model_training_step_with_pallas(self, tiny_config):
        """Full pretraining step with pallas attention + dropout active."""
        import jax

        from vilbert_tpu.core.config import OptimizerConfig
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.parallel.train_step import TrainState, make_train_step
        from vilbert_tpu.train.optim import build_optimizer
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        cfg = tiny_config.replace(
            use_pallas_attention=True,
            hidden_dropout_prob=0.1,
            attention_probs_dropout_prob=0.1,
            v_hidden_dropout_prob=0.1,
            v_attention_probs_dropout_prob=0.1,
            v_target_size=7,
        )
        model = ViLBERTForPretraining(cfg)
        B, T, R = 2, 8, 5
        rng_np = np.random.RandomState(0)
        batch = {
            "input_ids": rng_np.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
            "image_feat": rng_np.randn(B, R, cfg.v_feature_size).astype(np.float32),
            "image_loc": rng_np.rand(B, R, 5).astype(np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "lm_label_ids": np.full((B, T), -1, np.int32),
            "image_label": np.full((B, R - 1), 1, np.int32),
            "image_target": (np.ones((B, R - 1, 7)) / 7).astype(np.float32),
            "is_next": np.zeros((B,), np.int32),
        }
        batch["lm_label_ids"][:, 1] = 5
        params = model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["image_feat"],
            batch["image_loc"],
        )["params"]
        tx, _ = build_optimizer(OptimizerConfig(schedule="constant"), params, 10)
        state = TrainState.create(params, tx)
        loss_fn = make_pretrain_loss_fn(model, cfg, deterministic=False)
        step = make_train_step(loss_fn, tx, jit=True)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
