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


@pytest.mark.slow
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


@pytest.mark.slow
def test_int8_score_neutral_after_training(tiny_config):
    """Fine-tune a tiny model until it solves its training pool, then eval
    the SAME trained params with int8_matmul on and off: the score must be
    int8-neutral (within one sample flip). The eval pool is the training
    pool — at this scale (48 samples, 4-layer/32-hidden model) training
    memorizes rather than generalizes, and memorized samples are exactly
    what the neutrality check needs: confident logits far from argmax
    ties, produced by genuinely trained (non-random) weights. This is the
    trained-model guarantee the logit-correlation test above (random-ish
    weights) cannot give."""
    import dataclasses

    import jax

    from vilbert_tpu.core.config import OptimizerConfig, TaskConfig
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
    from vilbert_tpu.train.multitask import (
        MultiTaskTrainer, make_task_eval_fn,
    )

    cfg = dataclasses.replace(tiny_config, int8_matmul=False)
    B, T, R = 8, 9, 6
    rng = np.random.RandomState(5)
    proj = rng.randn(cfg.v_feature_size, 3).astype(np.float32)

    def batches(n, seed):
        r = np.random.RandomState(seed)
        out = []
        for _ in range(n):
            feats = r.randn(B, R, cfg.v_feature_size).astype(np.float32)
            cls = np.argmax(feats.mean(axis=1) @ proj, axis=1)
            out.append({
                "question": r.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
                "features": feats,
                "spatials": r.rand(B, R, 5).astype(np.float32),
                "segment_ids": np.zeros((B, T), np.int32),
                "input_mask": np.ones((B, T), np.int32),
                "image_mask": np.ones((B, R), np.int32),
                "co_attention_mask": np.zeros((B, R, T), np.float32),
                "target": cls.astype(np.int32),
            })
        return out

    class L:
        def __init__(self, bs):
            self.bs = bs
            self.batch_size = B

        def __iter__(self):
            return iter(self.bs)

        def __len__(self):
            return len(self.bs)

    tasks = {"TASK_B": TaskConfig(
        task_id=2, name="B", type="VL-tri-classifier",
        loss="CrossEntropyLoss", batch_size=B, lr=1e-3, num_epoch=1,
        num_labels=3,
    )}
    pool = batches(6, 7)  # 48 samples, recycled every epoch
    NV = 6 * B
    val = pool
    trainer = MultiTaskTrainer(
        cfg, tasks, {"TASK_B": L(pool)},
        val_loaders={"TASK_B": L(val)},
        opt_cfg=OptimizerConfig(learning_rate=1e-3, schedule="constant",
                                correct_bias=False),
        num_labels=16, num_train_epochs=1, dropout_prob=0.0,
    )
    for it in range(60):
        trainer.train_iteration(it)
    fp32_score = trainer.evaluate("TASK_B")["score"]
    assert fp32_score >= 0.9, f"training failed to move the score: {fp32_score}"

    # same trained params through the int8 graph
    cfg8 = dataclasses.replace(cfg, int8_matmul=True)
    m8 = ViLBERTForVLTasks(cfg8, num_labels=16)
    eval8 = make_task_eval_fn(m8, cfg8, tasks["TASK_B"])
    tot = n = 0.0
    for b in val:
        bb = {k: v for k, v in b.items() if k != "target"}
        _, score = eval8(trainer.state.params, b)
        tot += float(np.asarray(score).sum())
        n += B
    int8_score = tot / n
    assert abs(int8_score - fp32_score) <= 1.0 / NV + 1e-9, (
        fp32_score, int8_score
    )
