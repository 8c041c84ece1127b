"""CC pretraining validation pass (reference train_concap.py:608-654)."""

import numpy as np
import pytest


def _batches(cfg, n, batch=8, seq=9, regions=6, seed=3):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        b = {
            "input_ids": rng.randint(1, cfg.vocab_size, (batch, seq)).astype(np.int32),
            "segment_ids": np.zeros((batch, seq), np.int32),
            "input_mask": np.ones((batch, seq), np.int32),
            "image_feat": rng.randn(batch, regions, cfg.v_feature_size).astype(np.float32),
            "image_loc": rng.rand(batch, regions, 5).astype(np.float32),
            "image_mask": np.ones((batch, regions), np.int32),
            "lm_label_ids": np.full((batch, seq), -1, np.int64),
            "image_label": np.full((batch, regions - 1), -1, np.int64),
            "image_target": rng.rand(batch, regions - 1, cfg.v_target_size).astype(np.float32),
            "is_next": rng.randint(0, 2, (batch,)).astype(np.int64),
        }
        b["lm_label_ids"][:, 2] = rng.randint(0, cfg.vocab_size, batch)
        b["image_label"][:, 1] = 1
        b["image_target"] /= b["image_target"].sum(-1, keepdims=True)
        out.append(b)
    return out


@pytest.mark.slow
def test_validation_pass_means_and_history(tiny_config):
    import jax

    from vilbert_tpu.core.config import OptimizerConfig
    from vilbert_tpu.models.vilbert import ViLBERTForPretraining
    from vilbert_tpu.train.pretrain import (
        evaluate_pretraining,
        make_pretrain_loss_fn,
        run_pretraining,
    )

    cfg = tiny_config
    train = _batches(cfg, 2)
    val = _batches(cfg, 3, seed=9)

    model = ViLBERTForPretraining(cfg)
    b0 = train[0]
    params = model.init(
        jax.random.PRNGKey(0), b0["input_ids"], b0["image_feat"],
        b0["image_loc"],
    )["params"]

    # evaluate_pretraining = mean of the per-batch deterministic losses
    metrics = evaluate_pretraining(cfg, params, val)
    loss_fn = make_pretrain_loss_fn(model, cfg, deterministic=True)
    direct = []
    for b in val:
        loss, _ = loss_fn(params, b, jax.random.PRNGKey(0))
        direct.append(float(loss))
    assert np.isfinite(list(metrics.values())).all()
    np.testing.assert_allclose(metrics["loss"], np.mean(direct), rtol=1e-5)
    for key in ("masked_loss_t", "masked_loss_v", "next_sentence_loss"):
        assert key in metrics

    # run_pretraining runs the val pass every val_every steps + records it
    history = []
    run_pretraining(
        cfg, OptimizerConfig(learning_rate=1e-4), train,
        num_steps=4, init_params=params, log_every=0,
        val_loader=val, val_every=2, val_history=history,
    )
    assert [step for step, _ in history] == [2, 4]
    assert all(np.isfinite(m["loss"]) for _, m in history)
    # training should not increase val loss on the same tiny distribution
    assert history[-1][1]["loss"] <= metrics["loss"] * 1.5


@pytest.mark.slow
def test_baseline_pretraining_and_freeze(tiny_config):
    """--baseline pretrains the single-stream model (reference
    train_concap.py:397-414) and --freeze keeps the frozen text prefix
    untouched (train_concap.py:171-176)."""
    import jax

    from vilbert_tpu.cli.train_tasks import freeze_prefixes
    from vilbert_tpu.core.config import OptimizerConfig
    from vilbert_tpu.train.pretrain import run_pretraining

    from vilbert_tpu.models.basebert import BaseBertForPretraining
    from vilbert_tpu.train.optim import path_str

    cfg = tiny_config
    train = _batches(cfg, 2)
    b0 = train[0]
    init = BaseBertForPretraining(cfg).init(
        jax.random.PRNGKey(0), b0["input_ids"], b0["image_feat"],
        b0["image_loc"],
    )["params"]
    # numpy snapshot: the jitted step donates the state, deleting `init`
    flat_init = dict(
        jax.tree_util.tree_leaves_with_path(jax.device_get(init))
    )
    history = []
    prefixes = freeze_prefixes("0")
    state = run_pretraining(
        cfg, OptimizerConfig(learning_rate=1e-3), train,
        num_steps=3, log_every=0, model_family="basebert",
        freeze_prefix=prefixes, init_params=init,
        val_loader=train[:1], val_history=history,
    )
    assert history and np.isfinite(history[-1][1]["loss"])
    # frozen prefix (text embeddings + layer 0) unchanged; the rest trained
    frozen = trained = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        before, after = np.asarray(flat_init[path]), np.asarray(leaf)
        if path_str(path).startswith(tuple(prefixes)):
            np.testing.assert_array_equal(before, after, err_msg=path_str(path))
            frozen += 1
        elif not np.array_equal(before, after):
            trained += 1
    assert frozen > 4 and trained > 4, (frozen, trained)
