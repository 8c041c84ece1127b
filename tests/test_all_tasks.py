"""Integration: every task in configs/tasks.yml trains one (eager) step.

Builds a synthetic dataset matching each task's type/process, runs the
actual per-task loss function used by the multi-task trainer, and checks
the loss is finite — catching registry/type/reshape wiring errors across
all 18 reference tasks.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def world():
    import jax

    from vilbert_tpu.core.config import ModelConfig, load_task_configs
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tokenization import HashTokenizer
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

    cfg = ModelConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        v_feature_size=16, v_hidden_size=24, v_num_hidden_layers=1,
        v_num_attention_heads=4, v_intermediate_size=48, v_target_size=11,
        bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0,), t_biattention_id=(1,),
        compute_dtype="float32", task_specific_tokens=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
    )
    tok = HashTokenizer(cfg.vocab_size)
    store = syn.synthetic_store(num_images=8, num_boxes=6, feature_dim=16)
    model = ViLBERTForVLTasks(cfg, num_labels=13, num_labels_gqa=9)
    params = model.init(
        jax.random.PRNGKey(0),
        np.ones((2, 10), np.int32),
        np.ones((2, 6, 16), np.float32),
        np.ones((2, 6, 5), np.float32),
        task_ids=np.zeros((2, 1), np.int32),
    )["params"]
    tasks = load_task_configs("configs/tasks.yml")
    return cfg, tok, store, model, params, tasks


def _make_dataset(task, tok, store, cfg):
    import dataclasses

    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DATASET_REGISTRY, DialogAnnotation

    T, R = 10, 8
    task = dataclasses.replace(task, max_seq_length=T, max_region_num=R,
                               batch_size=2)
    mk = dict(tokenizer=tok, max_seq_length=T, max_region_num=R)
    cls = DATASET_REGISTRY[task.name]
    if task.process == "dialog":
        rounds = [{"question": f"q {r}", "answer": f"a {r}",
                   "options": [f"opt {j}" for j in range(3)]} for r in range(2)]
        ds = cls([DialogAnnotation(i, str(i % 8), f"cap {i}", rounds)
                  for i in range(4)], store, num_rounds=2, num_options=3, **mk)
    elif task.type in ("VL-classifier", "VL-classifier-GQA"):
        n = 13 if task.type == "VL-classifier" else 9
        ds = cls(syn.vqa_annotations(num=4, num_images=8, num_labels=n),
                 store, num_labels=n, **mk)
    elif task.process == "expand":
        ds = cls(syn.expand_annotations(num=4, num_images=8), store, **mk)
    elif task.process == "retrieval":
        ds = cls(syn.retrieval_annotations(num=6, num_images=8), store, **mk)
    elif task.type == "V-logit":
        ds = cls(syn.grounding_annotations(store, num=4), store, **mk)
    elif task.type == "V-logit-mc":
        task = dataclasses.replace(task, max_region_num=108)
        mk["max_region_num"] = 108
        ds = cls(syn.pointing_annotations(store, num=4, num_mc=4,
                                          max_region_num=108), store, **mk)
    elif task.process == "nlvr":
        ds = cls(syn.nlvr2_annotations(num=4, num_images=8), store, **mk)
    else:  # VL-binary / VL-tri classifiers with normal process
        n_cls = 2 if task.type == "VL-binary-classifier" else 3
        ds = cls(syn.classification_annotations(num=4, num_images=8,
                                                num_classes=n_cls),
                 store, **mk)
    return task, ds


@pytest.mark.slow
def test_every_yaml_task_trains(world):
    import jax

    from vilbert_tpu.data.tasks import DataLoader
    from vilbert_tpu.train.multitask import make_task_loss_fn

    cfg, tok, store, model, params, tasks = world
    failures = {}
    for key, task in sorted(tasks.items(), key=lambda kv: kv[1].task_id):
        # FOIL/GuessWhat normal classification use a generic class; the
        # registry maps every yml name
        try:
            task2, ds = _make_dataset(task, tok, store, cfg)
            batch = next(iter(DataLoader(ds, 2, shuffle=False)))
            loss_fn = make_task_loss_fn(model, cfg, task2, deterministic=True)
            mb = {k: v for k, v in batch.items() if k != "question_id"}
            loss, metrics = loss_fn(params, mb, jax.random.PRNGKey(0))
            assert np.isfinite(float(loss)), f"{key}: loss {loss}"
        except Exception as e:  # collect all failures for one report
            failures[key] = f"{type(e).__name__}: {e}"
    assert not failures, failures
