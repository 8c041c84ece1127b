"""Dynamic int8 inference path (ops/quant.py, ModelConfig.int8_matmul)."""

import numpy as np
import pytest


def test_int8_dense_close_to_fp32():
    import jax.numpy as jnp

    from vilbert_tpu.ops.quant import int8_dense

    rng = np.random.RandomState(0)
    x = rng.randn(4, 7, 96).astype(np.float32)
    w = (rng.randn(96, 64) * rng.rand(64)).astype(np.float32)  # ragged scales
    exact = x.reshape(-1, 96) @ w
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.float32))
    err = np.abs(got.reshape(-1, 64) - exact) / (np.abs(exact).mean() + 1e-6)
    assert err.mean() < 0.02, err.mean()


def test_int8_projections_close():
    import jax.numpy as jnp

    from vilbert_tpu.ops.quant import int8_head_proj, int8_merge_proj

    rng = np.random.RandomState(1)
    b, s, i, h, d, o = 2, 5, 48, 4, 12, 32
    x = rng.randn(b, s, i).astype(np.float32)
    w = rng.randn(i, h, d).astype(np.float32)
    exact = np.einsum("bsi,ihd->bhsd", x, w)
    got = np.asarray(int8_head_proj(jnp.asarray(x), jnp.asarray(w), jnp.float32))
    rel = np.abs(got - exact).mean() / (np.abs(exact).mean() + 1e-6)
    assert rel < 0.02, rel

    ctx = rng.randn(b, h, s, d).astype(np.float32)
    wm = rng.randn(h * d, o).astype(np.float32)
    exact = np.einsum("bhsd,hdo->bso", ctx, wm.reshape(h, d, o))
    got = np.asarray(int8_merge_proj(jnp.asarray(ctx), jnp.asarray(wm), jnp.float32))
    rel = np.abs(got - exact).mean() / (np.abs(exact).mean() + 1e-6)
    assert rel < 0.02, rel


def test_int8_model_logits_track_fp32(tiny_config):
    """Same params, int8 vs fp32 forward: logits highly correlated and the
    param tree is IDENTICAL (checkpoints need no conversion)."""
    import dataclasses

    import jax

    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

    cfg32 = dataclasses.replace(tiny_config, int8_matmul=False)
    cfg8 = dataclasses.replace(tiny_config, int8_matmul=True)
    rng = np.random.RandomState(2)
    q = rng.randint(1, cfg32.vocab_size, (4, 10)).astype(np.int32)
    feats = rng.randn(4, 6, cfg32.v_feature_size).astype(np.float32)
    spats = rng.rand(4, 6, 5).astype(np.float32)

    m32, m8 = ViLBERTForVLTasks(cfg32), ViLBERTForVLTasks(cfg8)
    params = m32.init(jax.random.PRNGKey(0), q, feats, spats)["params"]
    p8 = m8.init(jax.random.PRNGKey(0), q, feats, spats)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p8)

    out32 = m32.apply({"params": params}, q, feats, spats,
                      heads=("vil_prediction",))
    out8 = m8.apply({"params": params}, q, feats, spats,
                    heads=("vil_prediction",))
    a = np.asarray(out32.vil_prediction, np.float32).ravel()
    b = np.asarray(out8.vil_prediction, np.float32).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr
