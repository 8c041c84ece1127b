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
        {"question": f"question number {r}", "answer": f"option {r + 1} round {r}",
         "gt_index": r + 1,
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
        num_rounds=3, num_options=4, total_seq_length=16,
    )
    loader = DataLoader(ds, 2, shuffle=False)
    batch = next(iter(loader))
    assert batch["question"].shape == (2, 3, 4, 16)
    assert batch["target"].shape == (2, 3)
    # ground-truth option is always candidate 0
    assert (batch["target"] == 0).all()

    # candidate 0 of round 0 encodes q [SEP] options[gt_index] [SEP] caption:
    # [CLS] q(2 tokens) [SEP] a(3) [SEP] fact(caption, 2) [SEP]
    row = batch["question"][0, 0, 0]
    seg = batch["segment_ids"][0, 0, 0]
    q_ids = tok.encode("question number 0")
    a_ids = tok.encode("option 1 round 0")
    cap = tok.encode("caption 0")
    expect = ([tok.cls_token_id] + q_ids + [tok.sep_token_id] + a_ids
              + [tok.sep_token_id] + cap + [tok.sep_token_id])
    assert row[: len(expect)].tolist() == expect
    # answer span is segment 1, question/fact segment 0 (reference :229-262)
    assert seg[: len(expect)].tolist() == (
        [0] * (len(q_ids) + 2) + [1] * (len(a_ids) + 1) + [0] * (len(cap) + 1)
    )
    # round 1's fact prepends q0 [SEP] a0 before the caption
    row1 = batch["question"][0, 1, 0].tolist()
    fact = (q_ids[:0] or []) + tok.encode("question number 0") + [
        tok.sep_token_id] + tok.encode("option 1 round 0")
    expect1_prefix = ([tok.cls_token_id] + tok.encode("question number 1")
                      + [tok.sep_token_id])
    assert row1[: len(expect1_prefix)] == expect1_prefix
    assert fact[0] in row1  # history tokens present

    # distractor candidates never duplicate the gt option
    for r in range(3):
        gt_row = batch["question"][0, r, 0].tolist()
        for i in range(1, 4):
            assert batch["question"][0, r, i].tolist() != gt_row

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
