"""Multi-task trainer on the 8-device mesh: sharded batches, replicated state."""

import pytest
import numpy as np

pytestmark = pytest.mark.slow


def test_multitask_trains_on_mesh(tiny_config):
    import jax

    from vilbert_tpu.core.config import OptimizerConfig, TaskConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DataLoader, VQADataset
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.parallel.mesh import make_mesh
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    cfg = tiny_config
    tok = HashTokenizer(cfg.vocab_size)
    store = syn.synthetic_store(num_images=16, num_boxes=5,
                                feature_dim=cfg.v_feature_size)
    tasks = {
        "TASK1": TaskConfig(task_id=1, name="VQA", type="VL-classifier",
                            loss="BCEWithLogitLoss", max_seq_length=10,
                            max_region_num=6, batch_size=8, lr=4e-4,
                            num_labels=13),
    }
    ds = VQADataset(syn.vqa_annotations(num=16, num_images=16), store, tok,
                    max_seq_length=10, max_region_num=6, num_labels=13)
    loaders = {"TASK1": DataLoader(ds, 8, seed=0)}
    mesh = make_mesh()
    assert mesh.devices.size == 8

    trainer = MultiTaskTrainer(
        cfg, tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-3, schedule="constant"),
        num_labels=13, seed=0, mesh=mesh,
    )
    losses = []
    for it in range(4):
        m = trainer.train_iteration(it)
        losses.append(float(m["TASK1"]["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    kernel = trainer.state.params["bert"]["t_pooler"]["dense"]["kernel"]
    assert kernel.sharding.is_fully_replicated
