"""Exact multi-task LR semantics: optimizer steps per task, LR per iteration."""

import numpy as np
import pytest


def test_external_lr_step_scales_updates():
    import jax
    import jax.numpy as jnp
    import optax

    from vilbert_tpu.parallel.train_step import TrainState, make_train_step

    def loss_fn(params, batch, rng):
        return jnp.sum(params["w"] * batch["x"]), {}

    tx = optax.sgd(1.0)
    params = {"w": jnp.ones((4,), jnp.float32)}
    batch = {"x": jnp.arange(4, dtype=jnp.float32)}
    step = make_train_step(loss_fn, tx, external_lr=True, jit=False)
    state = TrainState.create(params, tx)
    state, _ = step(state, batch, jax.random.PRNGKey(0), jnp.float32(0.5))
    # grad = x; sgd(1.0) update = -x; external lr 0.5 -> w = 1 - 0.5*x
    np.testing.assert_allclose(
        np.asarray(state.params["w"]), 1.0 - 0.5 * np.arange(4), rtol=1e-6
    )


def test_external_lr_group_ratios(tiny_config):
    """head group moves head_lr/base_lr times faster under external lr."""
    import jax
    import jax.numpy as jnp

    from vilbert_tpu.core.config import OptimizerConfig
    from vilbert_tpu.train.optim import build_optimizer

    params = {
        "bert": {"w": jnp.ones((8, 8), jnp.float32)},
        "vil_logit_dense": {"kernel": jnp.ones((8, 1), jnp.float32)},
    }
    cfg = OptimizerConfig(learning_rate=2e-5, head_lr=1e-4, weight_decay=0.0,
                          schedule="constant", name="adamw")
    tx, schedule = build_optimizer(cfg, params, 100, external_lr=True)
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    base_u = float(np.abs(np.asarray(updates["bert"]["w"])).mean())
    head_u = float(np.abs(np.asarray(updates["vil_logit_dense"]["kernel"])).mean())
    np.testing.assert_allclose(head_u / base_u, 1e-4 / 2e-5, rtol=1e-4)
    # schedule carries the absolute base lr
    np.testing.assert_allclose(float(schedule(0)), 2e-5, rtol=1e-6)


def _two_task_trainer(tiny_config, task_keys, opt_cfg):
    from vilbert_tpu.core.config import TaskConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DataLoader, VQADataset
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    cfg = tiny_config
    tok = HashTokenizer(cfg.vocab_size)
    store = syn.synthetic_store(num_images=8, num_boxes=5,
                                feature_dim=cfg.v_feature_size)
    mk = dict(tokenizer=tok, max_seq_length=10, max_region_num=6)
    tasks, loaders = {}, {}
    for i, key in enumerate(task_keys):
        tasks[key] = TaskConfig(
            task_id=i + 1, name=f"T{i}", type="VL-classifier",
            loss="BCEWithLogitLoss", max_seq_length=10, max_region_num=6,
            batch_size=4, lr=1e-3, num_labels=13, num_epoch=2,
        )
        ds = VQADataset(syn.vqa_annotations(num=8, num_images=8), store,
                        num_labels=13, **mk)
        loaders[key] = DataLoader(ds, 4, seed=i)
    return MultiTaskTrainer(cfg, tasks, loaders, opt_cfg=opt_cfg,
                            num_labels=13, seed=0)


@pytest.mark.slow
def test_multitask_lr_follows_iterations(tiny_config):
    """LR comes from the iteration counter, with the reference's
    first-task quirk (train_tasks.py:548-556): in iteration i the first
    task updates at schedule(i), later tasks at schedule(i+1)."""
    from vilbert_tpu.core.config import OptimizerConfig

    opt_cfg = OptimizerConfig(learning_rate=1e-3, schedule="warmup_linear",
                              warmup_proportion=0.5)

    def pooler(t):
        return np.asarray(
            t.state.params["bert"]["t_pooler"]["dense"]["kernel"]
        ).copy()

    # single task: iteration 0 runs at schedule(0) == 0 -> NO movement
    t1 = _two_task_trainer(tiny_config, ["TASK1"], opt_cfg)
    before = pooler(t1)
    t1.train_iteration(0)
    np.testing.assert_array_equal(before, pooler(t1))
    t1.train_iteration(1)  # schedule(1) > 0 -> params move
    assert np.abs(pooler(t1) - before).max() > 0

    # two tasks: the SECOND task of iteration 0 already sees schedule(1) > 0
    # (the warmup scheduler stepped right after the first task's update)
    t2 = _two_task_trainer(tiny_config, ["TASK1", "TASK15"], opt_cfg)
    before = pooler(t2)
    t2.train_iteration(0)
    assert np.abs(pooler(t2) - before).max() > 0


def test_bf16_second_moment_storage():
    """second_moment_dtype=bfloat16 stores nu compressed; updates stay close
    to the fp32-state variant (math is fp32, only storage is rounded)."""
    import jax
    import jax.numpy as jnp

    from vilbert_tpu.core.config import OptimizerConfig
    from vilbert_tpu.train.optim import build_optimizer

    params = {"bert": {"w": np.ones((16, 8), np.float32)}}
    grads = {"bert": {"w": np.random.RandomState(0).randn(16, 8).astype(np.float32)}}
    out = {}
    for dt in ("float32", "bfloat16"):
        cfg = OptimizerConfig(learning_rate=1e-3, schedule="constant",
                              second_moment_dtype=dt)
        tx, _ = build_optimizer(cfg, params, 10, external_lr=True)
        state = tx.init(params)
        upds = None
        for _ in range(3):
            upds, state = tx.update(jax.tree.map(jnp.asarray, grads), state, params)
        out[dt] = np.asarray(upds["bert"]["w"])
        nu = state.nu if hasattr(state, "nu") else state[0].nu
        assert str(nu["bert"]["w"].dtype) == dt
    np.testing.assert_allclose(out["bfloat16"], out["float32"], rtol=2e-2)


def test_bf16_first_moment_storage():
    """first_moment_dtype=bfloat16 stores mu compressed; updates stay close
    to the fp32-state variant (accumulation is fp32, storage is rounded).
    Unlike nu, mu's rounding error enters the update direction linearly, so
    the tolerance is the bf16 relative step (~8e-3 over 3 steps)."""
    import jax
    import jax.numpy as jnp

    from vilbert_tpu.core.config import OptimizerConfig
    from vilbert_tpu.train.optim import build_optimizer

    params = {"bert": {"w": np.ones((16, 8), np.float32)}}
    grads = {"bert": {"w": np.random.RandomState(1).randn(16, 8).astype(np.float32)}}
    out = {}
    for dt in ("float32", "bfloat16"):
        cfg = OptimizerConfig(learning_rate=1e-3, schedule="constant",
                              first_moment_dtype=dt)
        tx, _ = build_optimizer(cfg, params, 10, external_lr=True)
        state = tx.init(params)
        upds = None
        for _ in range(3):
            upds, state = tx.update(jax.tree.map(jnp.asarray, grads), state, params)
        out[dt] = np.asarray(upds["bert"]["w"])
        mu = state.mu if hasattr(state, "mu") else state[0].mu
        assert str(mu["bert"]["w"].dtype) == dt
    np.testing.assert_allclose(out["bfloat16"], out["float32"], rtol=2e-2, atol=1e-5)
