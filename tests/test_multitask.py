"""Multi-task trainer tests: every process mode + head type end to end."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def world(request):
    """Tiny model + five tasks covering all process modes/head types."""
    import jax

    from vilbert_tpu.core.config import ModelConfig, OptimizerConfig, TaskConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import (
        DataLoader, ExpandDataset, GroundingDataset, NLVR2Dataset,
        PointingDataset, RetrievalDataset, VQADataset,
    )
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    cfg = ModelConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        v_feature_size=16, v_hidden_size=24, v_num_hidden_layers=2,
        v_num_attention_heads=4, v_intermediate_size=48, v_target_size=11,
        bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(0, 1),
        compute_dtype="float32", task_specific_tokens=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
    )
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    store = syn.synthetic_store(num_images=12, num_boxes=6, feature_dim=16)

    R, T = 10, 12
    tasks = {
        "TASK1": TaskConfig(task_id=1, name="VQA", type="VL-classifier",
                            loss="BCEWithLogitLoss", process="normal",
                            max_seq_length=T, max_region_num=R, batch_size=4,
                            lr=4e-4, num_labels=13),
        "TASK5": TaskConfig(task_id=5, name="VCR_Q-A", type="VL-logit",
                            loss="CrossEntropyLoss", process="expand",
                            max_seq_length=T, max_region_num=R, batch_size=2,
                            lr=2e-4),
        "TASK8": TaskConfig(task_id=8, name="RetrievalCOCO", type="VL-logit",
                            loss="CrossEntropyLoss", process="retrieval",
                            max_seq_length=T, max_region_num=R, batch_size=2,
                            lr=2e-4),
        "TASK9": TaskConfig(task_id=9, name="refcoco+", type="V-logit",
                            loss="BCEWithLogitLoss", process="normal",
                            max_seq_length=T, max_region_num=R, batch_size=4,
                            lr=2e-4),
        "TASK12": TaskConfig(task_id=12, name="NLVR2",
                             type="VL-binary-classifier",
                             loss="CrossEntropyLoss", process="nlvr",
                             max_seq_length=T, max_region_num=R, batch_size=4,
                             lr=2e-4),
    }
    mk = dict(tokenizer=tok, max_seq_length=T, max_region_num=R)
    datasets = {
        "TASK1": VQADataset(syn.vqa_annotations(num=16, num_images=12),
                            store, num_labels=13, **mk),
        "TASK5": ExpandDataset(syn.expand_annotations(num=8, num_images=12),
                               store, **mk),
        "TASK8": RetrievalDataset(syn.retrieval_annotations(num=12, num_images=12),
                                  store, **mk),
        "TASK9": GroundingDataset(syn.grounding_annotations(store, num=16),
                                  store, **mk),
        "TASK12": NLVR2Dataset(syn.nlvr2_annotations(num=16, num_images=12),
                               store, **mk),
    }
    loaders = {
        k: DataLoader(datasets[k], tasks[k].batch_size, seed=1) for k in tasks
    }
    val_loaders = {
        k: DataLoader(datasets[k], tasks[k].batch_size, shuffle=False,
                      drop_last=False, seed=2)
        for k in tasks
    }
    trainer = MultiTaskTrainer(
        cfg, tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4, schedule="warmup_linear"),
        val_loaders=val_loaders, num_labels=13, seed=0,
    )
    return trainer, tasks


def test_loss_scales_follow_task_lrs(world):
    trainer, tasks = world
    assert trainer.loss_scales["TASK1"] == pytest.approx(2.0)
    assert trainer.loss_scales["TASK5"] == pytest.approx(1.0)
    assert trainer.opt_cfg.learning_rate == pytest.approx(2e-4)


@pytest.mark.slow
def test_round_robin_trains_all_tasks(world):
    trainer, tasks = world
    metrics = trainer.train_iteration(0)
    assert set(metrics) == set(tasks)
    for key, m in metrics.items():
        assert np.isfinite(float(m["loss"])), key
        assert 0.0 <= float(m["score"]) <= 1.0, key


@pytest.mark.slow
def test_training_reduces_losses(world):
    trainer, _ = world
    first, last = {}, {}
    for it in range(1, 13):
        metrics = trainer.train_iteration(it)
        for k, m in metrics.items():
            first.setdefault(k, float(m["loss"]))
            last[k] = float(m["loss"])
    improved = [k for k in first if last[k] < first[k]]
    assert len(improved) >= 3, (first, last)


def test_eval_due_reference_cadence():
    """_eval_due reproduces the reference gating (train_tasks.py:583-586):
    task k evaluates after every iterId that is a nonzero multiple of
    task_num_iters[k], plus the last step of the last epoch."""
    from types import SimpleNamespace

    from vilbert_tpu.train.multitask import MultiTaskTrainer

    ns = SimpleNamespace(
        task_num_iters={"A": 5, "B": 12}, median_num_iter=12, grad_accum=1
    )
    due = {
        k: [
            (e, it)
            for e in range(2)
            for it in range(12)
            if MultiTaskTrainer._eval_due(ns, e, it, 2, k)
        ]
        for k in ("A", "B")
    }
    # A wraps at iterId 5,10,15,20 (+ final step 23); iterId 0 never fires
    assert due["A"] == [(0, 5), (0, 10), (1, 3), (1, 8), (1, 11)]
    # B wraps at iterId 12 (+ final step 23)
    assert due["B"] == [(1, 0), (1, 11)]

    # grad_accum=2: our iteration covers two reference iterIds; same events
    ns2 = SimpleNamespace(
        task_num_iters={"A": 5}, median_num_iter=6, grad_accum=2
    )
    due2 = [
        (e, it)
        for e in range(2)
        for it in range(6)
        if MultiTaskTrainer._eval_due(ns2, e, it, 2, "A")
    ]
    # windows are aligned on PARAM STATE (reference eval after iterId s sees
    # params after floor((s+1)/ga) optimizer steps): iteration w covers
    # s ∈ [2w+1, 2w+3) → 5∈[5,7)@(0,2), 10∈[9,11)@(0,4), 15∈[15,17)@(1,1),
    # 20∈[19,21)@(1,3), plus the final step
    assert due2 == [(0, 2), (0, 4), (1, 1), (1, 3), (1, 5)]


def test_eval_feeds_controller(world):
    trainer, _ = world
    r = trainer.evaluate("TASK1", max_batches=2)
    assert np.isfinite(r["loss"]) and 0 <= r["score"] <= 1
    assert trainer.controller.controllers["TASK1"].last_epoch >= 0


def test_pointing_mc_path():
    """V-logit-mc needs max_region_num > 101; exercise separately."""
    import jax

    from vilbert_tpu.core.config import ModelConfig, TaskConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DataLoader, PointingDataset
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
    from vilbert_tpu.train.multitask import make_task_loss_fn

    cfg = ModelConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        v_feature_size=16, v_hidden_size=24, v_num_hidden_layers=1,
        v_num_attention_heads=4, v_intermediate_size=48, v_target_size=11,
        bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0,), t_biattention_id=(1,),
        compute_dtype="float32",
    )
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    store = syn.synthetic_store(num_images=6, num_boxes=6, feature_dim=16)
    R = 108
    ds = PointingDataset(
        syn.pointing_annotations(store, num=4, max_region_num=R),
        store, tok, max_seq_length=10, max_region_num=R,
    )
    batch = next(iter(DataLoader(ds, 2, shuffle=False)))
    assert batch["multiple_choice_ids"].shape == (2, 4)
    assert batch["target"].shape == (2, 4, 1)

    task = TaskConfig(task_id=4, name="Visual7w", type="V-logit-mc",
                      loss="BCEWithLogitLoss", max_seq_length=10,
                      max_region_num=R, batch_size=2, lr=2e-4)
    model = ViLBERTForVLTasks(cfg, num_labels=13)
    params = model.init(
        jax.random.PRNGKey(0), batch["question"], batch["features"],
        batch["spatials"],
    )["params"]
    loss_fn = make_task_loss_fn(model, cfg, task, deterministic=True)
    b = {k: v for k, v in batch.items() if k != "question_id"}
    loss, metrics = loss_fn(params, b, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_bf16_compressed_feature_transfer_trains():
    """With bf16 compute the per-task prefetch ships features as bf16
    (compress_for_transfer) — one round-robin iteration must train finite."""
    from vilbert_tpu.core.config import ModelConfig, OptimizerConfig, TaskConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DataLoader, VQADataset
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=32, max_position_embeddings=32,
        v_feature_size=16, v_hidden_size=16, v_num_hidden_layers=1,
        v_num_attention_heads=4, v_intermediate_size=16, v_target_size=5,
        bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0,), t_biattention_id=(0,),
        compute_dtype="bfloat16",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
    )
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    store = syn.synthetic_store(num_images=8, num_boxes=5, feature_dim=16)
    tasks = {"TASK1": TaskConfig(
        task_id=1, name="VQA", type="VL-classifier", loss="BCEWithLogitLoss",
        process="normal", max_seq_length=10, max_region_num=8, batch_size=4,
        lr=4e-4, num_labels=7)}
    ds = VQADataset(syn.vqa_annotations(num=8, num_images=8, num_labels=7), store,
                    num_labels=7, tokenizer=tok, max_seq_length=10,
                    max_region_num=8)
    trainer = MultiTaskTrainer(
        cfg, tasks, {"TASK1": DataLoader(ds, 4, seed=1)},
        opt_cfg=OptimizerConfig(learning_rate=1e-4, schedule="constant"),
        num_labels=7, seed=0,
    )
    rt = trainer.tasks["TASK1"]
    assert rt.compute_dtype == "bfloat16"
    metrics = trainer.train_iteration(0)
    import jax.numpy as jnp

    batch = rt.next_batch()
    assert batch["features"].dtype == jnp.bfloat16
    assert np.isfinite(float(metrics["TASK1"]["loss"]))


@pytest.mark.slow
def test_train_loop_reference_cadence():
    """trainer.train(eval_cadence='reference') evaluates exactly when a task
    wraps its loader + at the final step, feeding the stop controller."""
    import jax

    from vilbert_tpu.core.config import ModelConfig, OptimizerConfig, TaskConfig
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DataLoader, VQADataset
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    cfg = ModelConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=32,
        v_feature_size=8, v_hidden_size=16, v_num_hidden_layers=1,
        v_num_attention_heads=2, v_intermediate_size=32, v_target_size=5,
        bi_hidden_size=16, bi_num_attention_heads=2,
        v_biattention_id=(0,), t_biattention_id=(0,),
        compute_dtype="float32", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
        v_attention_probs_dropout_prob=0.0,
    )
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    store = syn.synthetic_store(num_images=8, num_boxes=4, feature_dim=8)
    task = {"TASK1": TaskConfig(
        task_id=1, name="VQA", type="VL-classifier", loss="BCEWithLogitLoss",
        process="normal", max_seq_length=8, max_region_num=6, batch_size=4,
        lr=1e-4, num_labels=7, num_epoch=2,
    )}
    mk = dict(tokenizer=tok, max_seq_length=8, max_region_num=6)
    ds = VQADataset(syn.vqa_annotations(num=8, num_images=8, num_labels=7),
                    store, num_labels=7, **mk)
    loaders = {"TASK1": DataLoader(ds, 4, seed=0)}      # len 2
    val = {"TASK1": DataLoader(ds, 4, shuffle=False, drop_last=False)}
    trainer = MultiTaskTrainer(
        cfg, task, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4, schedule="warmup_linear"),
        val_loaders=val, num_labels=7, num_train_epochs=2,
    )
    evals = []
    orig = trainer.evaluate
    trainer.evaluate = lambda k, **kw: (evals.append(trainer.epoch), orig(k, **kw))[1]
    trainer.train(2, lr_drop_epochs=(), log_every=0)
    # task_num_iters=2, median=2, 2 epochs -> wraps at iterId 2 (epoch 1,
    # it 0) plus the final step (epoch 1, it 1)
    assert evals == [1, 1], evals
    assert trainer.controller.controllers["TASK1"].last_epoch >= 0
