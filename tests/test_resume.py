"""Multi-task checkpoint/resume: state + controllers + logger round-trip."""

import numpy as np
import pytest


@pytest.mark.slow
def test_multitask_save_restore(tiny_config, tmp_path):
    import jax

    from vilbert_tpu.core.config import OptimizerConfig, TaskConfig, TrainConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DataLoader, VQADataset
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    cfg = tiny_config
    tok = HashTokenizer(cfg.vocab_size)
    store = syn.synthetic_store(num_images=8, num_boxes=5, feature_dim=cfg.v_feature_size)
    tasks = {
        "TASK1": TaskConfig(task_id=1, name="VQA", type="VL-classifier",
                            loss="BCEWithLogitLoss", max_seq_length=10,
                            max_region_num=6, batch_size=4, lr=4e-4,
                            num_labels=13),
    }
    ds = VQADataset(syn.vqa_annotations(num=8, num_images=8), store, tok,
                    max_seq_length=10, max_region_num=6, num_labels=13)
    loaders = {"TASK1": DataLoader(ds, 4, seed=0)}

    def make_trainer():
        return MultiTaskTrainer(
            cfg, tasks, loaders,
            opt_cfg=OptimizerConfig(learning_rate=1e-3, schedule="constant"),
            train_cfg=TrainConfig(checkpoint_dir=str(tmp_path / "ckpt")),
            num_labels=13, seed=0,
        )

    t1 = make_trainer()
    t1.attach_logger(str(tmp_path / "logs"))
    for it in range(3):
        t1.train_iteration(it)
    t1.controller.controllers["TASK1"].in_stop = True
    t1.epoch = 2
    t1.save_checkpoint()
    kernel_before = np.asarray(
        t1.state.params["bert"]["t_pooler"]["dense"]["kernel"]
    )

    t2 = make_trainer()
    t2.attach_logger(str(tmp_path / "logs2"))
    step = t2.restore_checkpoint()
    assert step == 3
    assert t2.global_step == 3
    assert t2.epoch == 2
    assert t2.controller.controllers["TASK1"].in_stop
    np.testing.assert_array_equal(
        np.asarray(t2.state.params["bert"]["t_pooler"]["dense"]["kernel"]),
        kernel_before,
    )
    assert int(t2.state.step) == int(t1.state.step)
    # training continues from the restored state; iteration 4 trains the
    # stopped task too (train_iter_gap=4 gating)
    m = t2.train_iteration(4)
    assert np.isfinite(float(m["TASK1"]["loss"]))


def test_async_save_round_trips(tmp_path):
    """wait=False staging: orbax copies device arrays to host before
    returning (donation-safe), writes in background; wait_until_finished
    then restore must round-trip exactly."""
    import jax.numpy as jnp
    import numpy as np

    from vilbert_tpu.core.checkpoint import CheckpointManager

    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.int32(7)}
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(3, state, host_state={"epoch": 1}, wait=False)
    mngr.mngr.wait_until_finished()
    template = {"w": jnp.zeros((3, 4)), "step": jnp.int32(0)}
    restored, host, step = mngr.restore(template)
    assert step == 3 and host == {"epoch": 1}
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))
    mngr.close()


def test_restore_converts_state_dtype_mismatch(tmp_path):
    """A checkpoint saved with --bf16_adam_state must resume cleanly into an
    fp32-configured run (and vice versa): restore converts every leaf to the
    template dtype instead of silently keeping the saved one (ADVICE r4)."""
    import jax.numpy as jnp
    import numpy as np

    from vilbert_tpu.core.checkpoint import CheckpointManager

    saved = {"mu": jnp.arange(6.0, dtype=jnp.bfloat16),
             "nu": jnp.ones(6, jnp.bfloat16),
             "w": jnp.full(6, 2.0, jnp.float32)}
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(1, saved)
    template = {"mu": jnp.zeros(6, jnp.float32),
                "nu": jnp.zeros(6, jnp.float32),
                "w": jnp.zeros(6, jnp.float32)}
    restored, _, step = mngr.restore(template)
    assert step == 1
    assert restored["mu"].dtype == jnp.float32
    assert restored["nu"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(restored["mu"]),
                               np.arange(6.0, dtype=np.float32))
    mngr.close()
