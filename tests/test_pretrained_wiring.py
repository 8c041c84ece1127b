"""CLI-level wiring: --from_pretrained, --baseline, schedule length.

Round-1 verdict items 2 (from_pretrained silently ignored by train_tasks)
and ADVICE #3 (iterations-per-epoch must be the reference's MAX ave_iter,
train_tasks.py:333-352).
"""

import numpy as np
import pytest

from vilbert_tpu.core.config import ModelConfig, OptimizerConfig, TaskConfig
from vilbert_tpu.data import synthetic as syn
from vilbert_tpu.data.tasks import DataLoader, RetrievalDataset, VQADataset
from vilbert_tpu.data.tokenization import HashTokenizer
from vilbert_tpu.train.multitask import MultiTaskTrainer


def tiny_cfg(**kw):
    return ModelConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        v_feature_size=16, v_hidden_size=24, v_num_hidden_layers=2,
        v_num_attention_heads=4, v_intermediate_size=48, v_target_size=11,
        bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(0, 1),
        compute_dtype="float32",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
        **kw,
    )


def make_world(num_epoch1=2, num_epoch2=6):
    tok = HashTokenizer(vocab_size=120)
    store = syn.synthetic_store(num_images=12, num_boxes=6, feature_dim=16)
    R, T = 10, 12
    tasks = {
        "TASK1": TaskConfig(task_id=1, name="VQA", type="VL-classifier",
                            loss="BCEWithLogitLoss", process="normal",
                            max_seq_length=T, max_region_num=R, batch_size=4,
                            lr=4e-4, num_labels=13, num_epoch=num_epoch1),
        "TASK8": TaskConfig(task_id=8, name="RetrievalCOCO", type="VL-logit",
                            loss="CrossEntropyLoss", process="retrieval",
                            max_seq_length=T, max_region_num=R, batch_size=2,
                            lr=2e-4, num_epoch=num_epoch2),
    }
    mk = dict(tokenizer=tok, max_seq_length=T, max_region_num=R)
    datasets = {
        "TASK1": VQADataset(syn.vqa_annotations(num=16, num_images=12),
                            store, num_labels=13, **mk),
        "TASK8": RetrievalDataset(syn.retrieval_annotations(num=12, num_images=12),
                                  store, **mk),
    }
    loaders = {k: DataLoader(datasets[k], tasks[k].batch_size, seed=1)
               for k in tasks}
    return tasks, loaders


def flat_leaves(params):
    from vilbert_tpu.core.importer import _flatten

    return _flatten(params)


def test_ave_iter_is_max_not_median():
    # reference: ave_iter_k = int(num_epoch_k * len(loader_k) / num_train_epochs);
    # iterations per epoch = max_k (train_tasks.py:333-352)
    tasks, loaders = make_world(num_epoch1=2, num_epoch2=6)
    tr = MultiTaskTrainer(
        tiny_cfg(), tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4, schedule="warmup_linear"),
        num_labels=13, num_train_epochs=2,
    )
    expected = max(
        int(tasks[k].num_epoch * len(loaders[k]) / 2) for k in tasks
    )
    assert tr.median_num_iter == expected
    assert tr.num_train_epochs == 2


def test_from_pretrained_npz(tmp_path):
    from vilbert_tpu.core.checkpoint import save_params

    tasks, loaders = make_world()
    donor = MultiTaskTrainer(
        tiny_cfg(), tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4), num_labels=13, seed=7,
    )
    path = str(tmp_path / "donor.npz")
    save_params(path, donor.state.params)

    fresh = MultiTaskTrainer(
        tiny_cfg(), tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4), num_labels=13, seed=0,
    )
    loaded = MultiTaskTrainer(
        tiny_cfg(), tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4), num_labels=13, seed=0,
        from_pretrained=path,
    )
    d, f, l = (flat_leaves(t.state.params) for t in (donor, fresh, loaded))
    # loaded == donor everywhere, and differs from the seed-0 random init
    diffs = 0
    for k in d:
        np.testing.assert_allclose(np.asarray(l[k]), np.asarray(d[k]), err_msg=k)
        if not np.allclose(np.asarray(f[k]), np.asarray(d[k])):
            diffs += 1
    assert diffs > 10  # sanity: the donor init really was different


@pytest.mark.slow
def test_baseline_family_trains():
    tasks, loaders = make_world()
    tr = MultiTaskTrainer(
        tiny_cfg(), tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4), num_labels=13,
        model_family="basebert",
    )
    metrics = tr.train_iteration(0)
    assert set(metrics) == set(tasks)
    for k, m in metrics.items():
        assert np.isfinite(float(m["loss"])), k


@pytest.mark.slow
def test_gradient_accumulation():
    # one iteration scans ga divided batches and steps once; the iteration
    # count shrinks by ga so optimization steps match the reference's
    # median*epochs//ga (train_tasks.py:352-354)
    from vilbert_tpu.core.config import TrainConfig

    tasks, loaders = make_world()
    base = MultiTaskTrainer(
        tiny_cfg(), tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4), num_labels=13,
        num_train_epochs=2,
    )
    tr = MultiTaskTrainer(
        tiny_cfg(), tasks, loaders,
        opt_cfg=OptimizerConfig(learning_rate=1e-4), num_labels=13,
        num_train_epochs=2,
        train_cfg=TrainConfig(gradient_accumulation_steps=2),
    )
    assert tr.median_num_iter == base.median_num_iter // 2
    metrics = tr.train_iteration(0)
    assert set(metrics) == set(tasks)
    for k, m in metrics.items():
        assert np.isfinite(float(m["loss"])), k


def test_unknown_family_rejected():
    tasks, loaders = make_world()
    with pytest.raises(ValueError, match="model_family"):
        MultiTaskTrainer(tiny_cfg(), tasks, loaders, num_labels=13,
                         model_family="nope")
