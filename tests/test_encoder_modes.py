"""Encoder special modes: fast_mode, in_batch_pairs, frozen prefixes, NCE."""

import numpy as np
import pytest


def _inputs(cfg, B=3, T=7, R=5, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
        rng.randn(B, R, cfg.v_feature_size).astype(np.float32),
        rng.rand(B, R, 5).astype(np.float32),
    )


class TestFastMode:
    def test_fast_mode_equals_broadcast(self, tiny_config):
        """fast_mode: 1 caption broadcast over N images == explicit N-batch
        (reference vilbert.py:1042-1053, used by eval_retrieval)."""
        import jax

        from vilbert_tpu.models.vilbert import BertModel

        cfg = tiny_config
        ids, feats, locs = _inputs(cfg, B=3)
        model = BertModel(cfg)
        params = model.init(jax.random.PRNGKey(0), ids, feats, locs)

        fast = BertModel(cfg.replace(fast_mode=True))
        out_fast = fast.apply(params, ids[:1], feats, locs)

        ids_full = np.repeat(ids[:1], 3, axis=0)
        out_full = model.apply(params, ids_full, feats, locs)
        np.testing.assert_allclose(
            np.asarray(out_fast.sequence_v), np.asarray(out_full.sequence_v),
            atol=1e-5, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_fast.pooled_t), np.asarray(out_full.pooled_t),
            atol=1e-5, rtol=1e-5,
        )

    def test_in_batch_pairs_expands_to_b_squared(self, tiny_config):
        """in_batch_pairs: B² (text_i, image_j) pairs after the first
        co-attention (reference vilbert.py:1008-1040)."""
        import jax

        from vilbert_tpu.models.vilbert import BertModel

        cfg = tiny_config.replace(in_batch_pairs=True)
        ids, feats, locs = _inputs(cfg, B=3)
        model = BertModel(cfg)
        params = model.init(jax.random.PRNGKey(0), ids, feats, locs)
        out = model.apply(params, ids, feats, locs)
        assert out.sequence_t.shape[0] == 9
        assert out.sequence_v.shape[0] == 9
        # pair (i, j): text i with image j — diagonal equals the plain run
        plain = BertModel(tiny_config)
        out_plain = plain.apply(params, ids, feats, locs)
        diag = np.asarray(out.sequence_t).reshape(3, 3, *out.sequence_t.shape[1:])
        for i in range(3):
            np.testing.assert_allclose(
                diag[i, i], np.asarray(out_plain.sequence_t)[i],
                atol=1e-5, rtol=1e-5,
            )


class TestFrozenLayers:
    def test_fixed_layers_receive_no_gradient(self, tiny_config):
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.models.vilbert import BertModel

        cfg = tiny_config.replace(fixed_t_layer=2, fixed_v_layer=1)
        ids, feats, locs = _inputs(cfg)
        model = BertModel(cfg)
        params = model.init(jax.random.PRNGKey(0), ids, feats, locs)["params"]

        def loss(p):
            out = model.apply({"params": p}, ids, feats, locs)
            return jnp.sum(out.pooled_t.astype(jnp.float32) ** 2)

        grads = jax.grad(loss)(params)
        enc = grads["encoder"]
        # frozen prefix: text layers 0,1 and image layer 0 get zero grads
        for name in ("layer_0", "layer_1", "v_layer_0"):
            g = np.concatenate([
                np.ravel(x) for x in jax.tree.leaves(enc[name])
            ])
            assert np.abs(g).max() == 0.0, name
        g2 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(enc["layer_2"])])
        assert np.abs(g2).max() > 0


class TestNCELoss:
    def test_visual_target_2_nce(self, tiny_config):
        """NCE masked-region loss (visual_target=2): finite, permutation-
        sensitive, and ≈ -log p with the right class count scale."""
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.train.losses import masked_image_loss

        B, R, D = 4, 7, 16
        rng = np.random.RandomState(0)
        pred = rng.randn(B, R, D).astype(np.float32)
        target = rng.randn(B, R - 1, D).astype(np.float32)
        label = np.where(rng.rand(B, R - 1) < 0.3, 1, -1).astype(np.int32)
        loss = masked_image_loss(
            jnp.asarray(pred), jnp.asarray(label), jnp.asarray(target),
            visual_target=2, num_negative=10, rng=jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(loss))
        # perfectly aligned prediction (huge margin) -> near-zero loss
        big = np.zeros_like(pred)
        big[:, 1:] = target * 100
        loss2 = masked_image_loss(
            jnp.asarray(big), jnp.asarray(label), jnp.asarray(target),
            visual_target=2, num_negative=10, rng=jax.random.PRNGKey(0),
        )
        assert float(loss2) < float(loss)


class TestVisualization:
    def test_attention_maps_captured(self, tiny_config):
        """visualization flag exposes per-layer attention through flax
        intermediates (replaces the reference's attn-map plumbing,
        vilbert.py:451-458)."""
        import jax

        from vilbert_tpu.models.vilbert import BertModel

        cfg = tiny_config.replace(visualization=True)
        ids, feats, locs = _inputs(cfg)
        model = BertModel(cfg)
        variables = model.init(jax.random.PRNGKey(0), ids, feats, locs)
        out, inter = model.apply(
            variables, ids, feats, locs,
            capture_intermediates=lambda mdl, name: name == "attention_probs",
            mutable=["intermediates"],
        )
        flat = jax.tree_util.tree_leaves_with_path(inter["intermediates"])
        assert len(flat) > 0
        shapes = [np.asarray(v).shape for _, v in flat]
        # text self-attention maps are [B, h, T, T]
        assert any(s[-1] == ids.shape[1] and s[-2] == ids.shape[1] for s in shapes)


class TestHeadMajorLayout:
    def test_head_major_matches_standard_layout(self, tiny_config):
        """head_major_attention is a pure layout optimization: with identical
        params it must reproduce the standard-layout forward (same GEMMs,
        different operand order — fp32 here, so near-bitwise)."""
        import jax

        from vilbert_tpu.models.vilbert import BertModel

        ids, feats, locs = _inputs(tiny_config, B=3)
        hm = BertModel(tiny_config.replace(head_major_attention=True))
        std = BertModel(tiny_config.replace(head_major_attention=False))
        params = hm.init(jax.random.PRNGKey(0), ids, feats, locs)
        # identical param trees (HeadProj/MergeProj are Dense-compatible)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
            params, std.init(jax.random.PRNGKey(0), ids, feats, locs),
        )
        out_hm = hm.apply(params, ids, feats, locs)
        out_std = std.apply(params, ids, feats, locs)
        for field in ("sequence_t", "sequence_v", "pooled_t", "pooled_v"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_hm, field)),
                np.asarray(getattr(out_std, field)),
                atol=2e-5, rtol=2e-5, err_msg=field,
            )

    def test_proj_impl_variants_agree(self, tiny_config):
        """The three projection spellings (folded einsum / 2D GEMM+transpose
        / custom-VJP backward) are pure scheduling variants: identical
        forward outputs AND gradients with shared params (fp32 here)."""
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.models.vilbert import BertModel

        ids, feats, locs = _inputs(tiny_config, B=3)
        models = {
            impl: BertModel(tiny_config.replace(proj_impl=impl))
            for impl in ("einsum", "gemm", "custom_bwd")
        }
        params = models["einsum"].init(jax.random.PRNGKey(0), ids, feats, locs)

        def loss(m):
            def fn(p):
                out = m.apply(p, ids, feats, locs)
                return (jnp.sum(jnp.sin(out.sequence_t))
                        + jnp.sum(jnp.cos(out.sequence_v)))
            return fn

        ref_l, ref_g = jax.value_and_grad(loss(models["einsum"]))(params)
        for impl in ("gemm", "custom_bwd"):
            l, g = jax.value_and_grad(loss(models[impl]))(params)
            np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-5)
            jax.tree_util.tree_map_with_path(
                lambda path, a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                    err_msg=f"{impl}:{path}",
                ),
                ref_g, g,
            )

    def test_head_major_dynamic_attention(self, tiny_config):
        """Dynamic-attention gates work in both layouts and agree."""
        import jax

        from vilbert_tpu.models.vilbert import BertModel

        cfg = tiny_config.replace(dynamic_attention=True)
        ids, feats, locs = _inputs(cfg, B=2)
        hm = BertModel(cfg.replace(head_major_attention=True))
        std = BertModel(cfg.replace(head_major_attention=False))
        params = hm.init(jax.random.PRNGKey(1), ids, feats, locs)
        out_hm = hm.apply(params, ids, feats, locs)
        out_std = std.apply(params, ids, feats, locs)
        np.testing.assert_allclose(
            np.asarray(out_hm.sequence_v), np.asarray(out_std.sequence_v),
            atol=2e-5, rtol=2e-5,
        )


class TestRemat:
    @pytest.mark.slow
    def test_remat_grad_matches_no_remat(self, tiny_config):
        """cfg.remat wraps the blocks in nn.remat (static deterministic arg);
        gradients must match the plain forward exactly."""
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.models.vilbert import BertModel

        ids, feats, locs = _inputs(tiny_config, B=2)
        plain = BertModel(tiny_config)
        remat = BertModel(tiny_config.replace(remat=True))
        params = plain.init(jax.random.PRNGKey(0), ids, feats, locs)

        def loss(model, p, det):
            out = model.apply(
                p, ids, feats, locs, deterministic=det,
                rngs=None if det else {"dropout": jax.random.PRNGKey(7)},
            )
            return jnp.sum(out.pooled_t ** 2) + jnp.sum(out.pooled_v ** 2)

        g_plain = jax.grad(lambda p: loss(plain, p, True))(params)
        g_remat = jax.grad(lambda p: loss(remat, p, True))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5),
            g_plain, g_remat,
        )
        # the dropout (non-deterministic) branch must also trace under remat
        g_drop = jax.grad(lambda p: loss(remat, p, False))(params)
        assert all(
            np.isfinite(x).all() for x in jax.tree.leaves(g_drop)
        )


class TestGeluRational:
    """gelu_impl="auto": the rational erf must be AT LEAST as accurate as
    the exact-erf implementation at bf16 precision.

    The rational P3/Q3 minimax has max abs error 9.7e-6 on erf — two decades
    below bf16 half-ulp (~2e-3). Measured against the correctly-rounded true
    gelu (f64 math.erf, rounded to bf16): the rational lands within 1 ulp or
    5e-5 absolute EVERYWHERE (the absolute branch covers the saturated tails
    where true gelu underflows toward 1e-32-scale values), while
    jax.nn.gelu's exact-erf path at bf16 does not (its internal bf16
    intermediate roundings cost several ulps) and is bitwise-correct less
    often (57% vs 78% on this grid). So "auto"->rational under bf16 compute
    does not loosen numerics — it tightens them while cutting XLA's ~30-op
    erfc expansion out of the FFN GEMM epilogue (docs/perf.md roofline)."""

    def test_bf16_at_least_as_accurate_as_exact_erf(self):
        from math import erf

        import jax.numpy as jnp

        from vilbert_tpu.models.layers import gelu, gelu_rational

        rng = np.random.RandomState(0)
        # cover the saturation tails, the clamp boundary, and the core range
        x = np.concatenate([
            rng.randn(20000).astype(np.float32) * 2.5,
            np.linspace(-12.0, 12.0, 20000, dtype=np.float32),
        ])
        xb = jnp.asarray(x, dtype=jnp.bfloat16)
        # absolute claim at f32 (pre-rounding): the approximation itself
        exact32 = np.asarray(gelu(jnp.asarray(x)), dtype=np.float32)
        approx32 = np.asarray(gelu_rational(jnp.asarray(x)), dtype=np.float32)
        assert np.abs(exact32 - approx32).max() < 5e-5

        # correctly-rounded truth at the actual bf16 input values
        xf = np.asarray(xb, dtype=np.float64)
        truth = np.asarray(
            jnp.asarray([0.5 * v * (1 + erf(v / np.sqrt(2))) for v in xf],
                        dtype=jnp.bfloat16))
        e = np.asarray(gelu(xb))
        a = np.asarray(gelu_rational(xb))

        def mono(v):
            u = v.view(np.uint16).astype(np.int32)
            return np.where(u & 0x8000, 0x8000 - (u & 0x7FFF), 0x8000 + u)

        ulp_e = np.abs(mono(e) - mono(truth))
        ulp_a = np.abs(mono(a) - mono(truth))
        # rational: within 1 ulp or 5e-5 absolute of truth, everywhere
        ok = (ulp_a <= 1) | (
            np.abs(a.astype(np.float32) - truth.astype(np.float32)) <= 5e-5)
        assert ok.all(), f"{(~ok).sum()} elements beyond 1ulp/5e-5 of truth"
        # and bitwise-correct at least as often as the exact-erf path
        assert (ulp_a == 0).mean() >= (ulp_e == 0).mean()

    def test_fp32_resolution_is_exact_erf(self, tiny_config):
        cfg = tiny_config.replace(compute_dtype="float32")
        assert cfg.resolved_gelu_impl == "exact"
        cfg = tiny_config.replace(compute_dtype="bfloat16")
        assert cfg.resolved_gelu_impl == "rational"

    def test_fp32_rational_grad_close(self):
        """Custom-JVP derivative (its own P3/Q3 rational, max err 5e-4 —
        below the bf16 cotangent rounding it feeds in training)."""
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.models.layers import gelu, gelu_rational

        x = jnp.linspace(-8.0, 8.0, 4001, dtype=jnp.float32)
        g_exact = jax.vmap(jax.grad(gelu))(x)
        g_approx = jax.vmap(jax.grad(gelu_rational))(x)
        assert float(jnp.abs(g_exact - g_approx).max()) < 6e-4
