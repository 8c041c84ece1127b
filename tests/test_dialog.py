"""VisDial dialog-process pipeline: dataset + trainer loss path."""

import numpy as np
import pytest


def test_dialog_end_to_end(tiny_config):
    import jax

    from vilbert_tpu.core.config import TaskConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DataLoader, DialogAnnotation, VisDialDataset
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
    from vilbert_tpu.train.multitask import make_task_loss_fn, process_batch

    cfg = tiny_config
    tok = HashTokenizer(cfg.vocab_size)
    store = syn.synthetic_store(num_images=4, num_boxes=5, feature_dim=cfg.v_feature_size)
    rounds = [
        {"question": f"question number {r}", "answer": f"answer {r}",
         "options": [f"option {j} round {r}" for j in range(5)]}
        for r in range(3)
    ]
    dialogs = [
        DialogAnnotation(question_id=i, image_id=str(i % 4),
                         caption=f"caption {i}", rounds=rounds)
        for i in range(4)
    ]
    ds = VisDialDataset(
        dialogs, store, tok, max_seq_length=16, max_region_num=6,
        num_rounds=3, num_options=4,
    )
    loader = DataLoader(ds, 2, shuffle=False)
    batch = next(iter(loader))
    assert batch["question"].shape == (2, 3, 4, 16)
    assert batch["target"].shape == (2, 3)
    # ground-truth option is always candidate 0
    assert (batch["target"] == 0).all()

    # process-mode flattening: 2 samples * 3 rounds * 4 options
    import jax.numpy as jnp

    p = process_batch("dialog", {k: jnp.asarray(v) for k, v in batch.items()
                                 if k != "question_id"})
    assert p["question"].shape == (24, 16)
    assert p["features"].shape == (24, 6, cfg.v_feature_size)
    assert p["target"].shape == (6,)

    task = TaskConfig(task_id=3, name="VisualDialog", type="VL-logit",
                      loss="CrossEntropyLoss", process="dialog",
                      max_seq_length=16, max_region_num=6, batch_size=2,
                      lr=4e-5)
    model = ViLBERTForVLTasks(cfg, num_labels=13)
    params = model.init(
        jax.random.PRNGKey(0),
        np.asarray(p["question"]), np.asarray(p["features"]),
        np.asarray(p["spatials"]),
    )["params"]
    loss_fn = make_task_loss_fn(model, cfg, task, deterministic=True)
    mb = {k: v for k, v in batch.items() if k != "question_id"}
    loss, metrics = loss_fn(params, mb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["score"]) <= 1.0
