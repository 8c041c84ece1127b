"""Counter-hash dropout: statistics, determinism, gradient flow."""

import numpy as np
import pytest


def test_hash_dropout_statistics():
    import jax
    import jax.numpy as jnp

    from vilbert_tpu.ops.dropout import hash_dropout

    x = jnp.ones((64, 257))
    out = hash_dropout(x, 0.3, jax.random.PRNGKey(0))
    kept = float(jnp.mean((np.asarray(out) > 0)))
    assert 0.65 < kept < 0.75
    # kept values rescaled by 1/(1-rate)
    vals = np.asarray(out)
    np.testing.assert_allclose(vals[vals > 0], 1 / 0.7, rtol=1e-5)
    # deterministic per rng, different across rngs
    out2 = hash_dropout(x, 0.3, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = hash_dropout(x, 0.3, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 0


def test_hash_dropout_deterministic_mode():
    import jax
    import jax.numpy as jnp

    from vilbert_tpu.ops.dropout import hash_dropout

    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(
        np.asarray(hash_dropout(x, 0.5, None, deterministic=True)),
        np.asarray(x),
    )


def test_fast_dropout_module_in_model(tiny_config):
    """Training step with FastDropout active end to end."""
    import jax

    from vilbert_tpu.models.vilbert import ViLBERTForPretraining

    cfg = tiny_config.replace(
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        v_hidden_dropout_prob=0.1, v_attention_probs_dropout_prob=0.1,
        use_fast_dropout=True,
    )
    model = ViLBERTForPretraining(cfg)
    ids = np.ones((2, 8), np.int32)
    feats = np.ones((2, 5, cfg.v_feature_size), np.float32)
    locs = np.ones((2, 5, 5), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, feats, locs)
    out1 = model.apply(params, ids, feats, locs, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = model.apply(params, ids, feats, locs, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    # dropout actually perturbs the forward
    assert np.abs(
        np.asarray(out1.prediction_scores_t) - np.asarray(out2.prediction_scores_t)
    ).max() > 0
    # deterministic mode unaffected by the flag
    det1 = model.apply(params, ids, feats, locs)
    det2 = ViLBERTForPretraining(cfg.replace(use_fast_dropout=False)).apply(
        params, ids, feats, locs
    )
    np.testing.assert_allclose(
        np.asarray(det1.prediction_scores_t), np.asarray(det2.prediction_scores_t),
        atol=1e-6,
    )


@pytest.mark.parametrize("variant", ["murmur3", "mix2"])
def test_hash_variant_statistics(variant):
    """Keep-rate, lag autocorrelation, and cross-seed decorrelation for both
    hash mixers. mix2 drops one u32 multiply (ops/dropout.py) — this pins
    that its masks remain statistically adequate for dropout: unbiased
    marginal rate, no adjacent-element correlation (the failure mode of a
    weak mixer over a sequential counter), and independent across seeds."""
    import jax
    import jax.numpy as jnp

    from vilbert_tpu.ops.dropout import hash_keep_mask

    n = 1 << 20
    rate = 0.1
    seed = jnp.uint32(0xDEADBEEF)
    keep = np.asarray(hash_keep_mask((n,), rate, seed, variant))
    p = keep.mean()
    # binomial sigma ~ 0.0003; allow 5 sigma
    assert abs(p - 0.9) < 5 * np.sqrt(0.09 / n)

    f = keep.astype(np.float64) - p
    for lag in (1, 2, 16, 768):
        corr = (f[:-lag] * f[lag:]).mean() / f.var()
        assert abs(corr) < 5 / np.sqrt(n), (lag, corr)

    keep2 = np.asarray(hash_keep_mask((n,), rate, jnp.uint32(0x12345), variant))
    f2 = keep2.astype(np.float64) - keep2.mean()
    cross = (f * f2).mean() / np.sqrt(f.var() * f2.var())
    assert abs(cross) < 5 / np.sqrt(n)


def test_dropout_hash_config_plumbing(tiny_config):
    """dropout_hash=mix2 reaches both the module sites and the attention
    path: masks differ from murmur3 at the same rng, forward still runs."""
    import jax

    from vilbert_tpu.models.vilbert import ViLBERTForPretraining

    outs = {}
    for variant in ("murmur3", "mix2"):
        cfg = tiny_config.replace(
            hidden_dropout_prob=0.3, attention_probs_dropout_prob=0.3,
            use_fast_dropout=True, dropout_hash=variant,
        )
        model = ViLBERTForPretraining(cfg)
        ids = np.ones((2, 8), np.int32)
        feats = np.ones((2, 5, cfg.v_feature_size), np.float32)
        locs = np.ones((2, 5, 5), np.float32)
        params = model.init(jax.random.PRNGKey(0), ids, feats, locs)
        outs[variant] = np.asarray(
            model.apply(params, ids, feats, locs, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)}
                        ).prediction_scores_t
        )
    assert np.abs(outs["murmur3"] - outs["mix2"]).max() > 0
