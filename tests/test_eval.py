"""Eval-layer tests: ranking math, task evaluators, VCR tooling, checkpoints."""

import json

import numpy as np
import pytest


class TestRankingMetrics:
    def test_perfect_and_worst(self):
        from vilbert_tpu.eval.retrieval import ranking_metrics

        n, p = 6, 10
        scores = np.random.RandomState(0).rand(n, p)
        targets = np.argmax(scores, axis=1)
        m = ranking_metrics(scores, targets)
        assert m == {"r1": 1.0, "r5": 1.0, "r10": 1.0, "medr": 1.0, "meanr": 1.0}
        worst = np.argmin(scores, axis=1)
        m = ranking_metrics(scores, worst)
        assert m["r1"] == 0.0 and m["medr"] == p

    def test_known_ranks(self):
        from vilbert_tpu.eval.retrieval import ranking_metrics

        scores = np.array([[3.0, 2.0, 1.0], [1.0, 3.0, 2.0]])
        # caption 0's true image is idx 1 (rank 1), caption 1's is idx 1 (rank 0)
        m = ranking_metrics(scores, np.array([1, 1]))
        assert m["r1"] == 0.5
        assert m["meanr"] == 1.5

    def test_five_captions_per_image_protocol(self):
        """The reference protocol scores 5N captions against an N-image pool
        (retreival_dataset.py:301-471); the ranking matrix is 5N x N and the
        target repeats per caption of the same image."""
        from vilbert_tpu.eval.retrieval import evaluate_retrieval

        N, R, D = 4, 3, 5
        rng = np.random.RandomState(0)
        pool = {
            "features": rng.rand(N, R, D).astype(np.float32),
            "spatials": rng.rand(N, R, 5).astype(np.float32),
            "image_mask": np.ones((N, R), np.int32),
        }
        # score = -|mean(caption ids) - mean(image features scaled)|: make a
        # scorer that always prefers the true image via a planted signature
        sig = pool["features"].mean(axis=(1, 2))  # [chunk] per image

        calls = []

        def scorer(q, feats, spats, im, sg, imask):
            calls.append(q.shape)
            want = float(q[0, 0]) / 1000.0
            return -np.abs(feats.mean(axis=(1, 2)) - want)

        def caps():
            for i in range(N):
                for j in range(5):
                    q = np.full((7,), int(sig[i] * 1000), np.int32)
                    yield {"question": q, "input_mask": np.ones(7, np.int32),
                           "segment_ids": np.zeros(7, np.int32),
                           "target_index": i}

        m = evaluate_retrieval(scorer, caps(), pool, chunk=N)
        assert len(calls) == 5 * N          # 5N captions, one chunk each
        assert m["r1"] > 0.9                # planted signal always ranks 1st
        assert m["medr"] == 1.0


class TestVCR:
    def test_joint_accuracy(self):
        from vilbert_tpu.eval.vcr import vcr_joint_accuracy

        qa = [{"question_id": 1, "answer": [0.9, 0.1, 0, 0]},
              {"question_id": 2, "answer": [0.1, 0.9, 0, 0]}]
        qar = [{"question_id": 1, "answer": [0, 1.0, 0, 0]},
               {"question_id": 2, "answer": [1.0, 0, 0, 0]}]
        m = vcr_joint_accuracy(
            qa, qar, qa_targets={1: 0, 2: 0}, qar_targets={1: 1, 2: 0},
        )
        # q1: A correct + R correct; q2: A wrong, R correct
        assert m["qa_accuracy"] == 0.5
        assert m["qar_accuracy"] == 1.0
        assert m["q_ar_accuracy"] == 0.5

    def test_submission_csv(self, tmp_path):
        from vilbert_tpu.eval.vcr import write_vcr_submission_csv

        qa = [{"question_id": 7, "answer": [0.7, 0.1, 0.1, 0.1]}]
        qar = [{"question_id": 7, "answer": [0.25, 0.25, 0.25, 0.25]}]
        path = write_vcr_submission_csv(qa, qar, str(tmp_path / "sub.csv"))
        rows = open(path).read().strip().split("\n")
        assert len(rows) == 2
        assert len(rows[1].split(",")) == 1 + 4 + 16


class TestEvaluateTask:
    def test_vqa_records_and_score(self, tiny_config):
        import jax

        from vilbert_tpu.core.config import TaskConfig
        from vilbert_tpu.data import synthetic as syn
        from vilbert_tpu.data.tasks import DataLoader, VQADataset
        from vilbert_tpu.data.tokenization import HashTokenizer
        from vilbert_tpu.eval.evaluators import evaluate_task, save_results
        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

        cfg = tiny_config
        tok = HashTokenizer(cfg.vocab_size)
        store = syn.synthetic_store(num_images=8, num_boxes=6, feature_dim=cfg.v_feature_size)
        ds = VQADataset(
            syn.vqa_annotations(num=8, num_images=8, num_labels=13),
            store, tok, max_seq_length=10, max_region_num=8, num_labels=13,
        )
        loader = DataLoader(ds, 4, shuffle=False, drop_last=False)
        task = TaskConfig(task_id=1, name="VQA", type="VL-classifier",
                          loss="BCEWithLogitLoss", max_seq_length=10,
                          max_region_num=8, batch_size=4, lr=4e-5)
        model = ViLBERTForVLTasks(cfg, num_labels=13)
        b = next(iter(loader))
        params = model.init(
            jax.random.PRNGKey(0), b["question"], b["features"], b["spatials"]
        )["params"]
        label2ans = [f"ans{i}" for i in range(13)]
        metrics, results = evaluate_task(
            model, cfg, task, params, loader, label2ans=label2ans
        )
        assert metrics["num_samples"] == 8
        assert len(results) == 8
        assert all(r["answer"].startswith("ans") for r in results)

        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            path = save_results(results, d, "VQA", "val")
            assert json.load(open(path)) == results


class TestCheckpoint:
    def test_params_npz_roundtrip(self, tiny_config, tmp_path):
        import jax

        from vilbert_tpu.core.checkpoint import load_params, save_params
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining

        model = ViLBERTForPretraining(tiny_config)
        params = model.init(
            jax.random.PRNGKey(0),
            np.ones((2, 8), np.int32),
            np.ones((2, 5, tiny_config.v_feature_size), np.float32),
            np.ones((2, 5, 5), np.float32),
        )["params"]
        path = str(tmp_path / "p.npz")
        save_params(path, params)
        loaded = load_params(path)
        flat1 = jax.tree_util.tree_leaves(params)
        flat2 = jax.tree_util.tree_leaves(loaded)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orbax_roundtrip(self, tiny_config, tmp_path):
        import jax

        from vilbert_tpu.core.checkpoint import CheckpointManager
        from vilbert_tpu.core.config import OptimizerConfig
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.parallel.train_step import TrainState
        from vilbert_tpu.train.optim import build_optimizer

        model = ViLBERTForPretraining(tiny_config)
        params = model.init(
            jax.random.PRNGKey(0),
            np.ones((2, 8), np.int32),
            np.ones((2, 5, tiny_config.v_feature_size), np.float32),
            np.ones((2, 5, 5), np.float32),
        )["params"]
        tx, _ = build_optimizer(OptimizerConfig(), params, 10)
        state = TrainState.create(params, tx)
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        host = {"controllers": {"TASK1": {"in_stop": False}}, "epoch": 3}
        mngr.save(5, state, host_state=host)
        restored, host2, step = mngr.restore(jax.tree.map(np.zeros_like, state))
        assert step == 5
        assert host2 == host
        np.testing.assert_array_equal(
            np.asarray(restored.params["bert"]["t_pooler"]["dense"]["kernel"]),
            np.asarray(state.params["bert"]["t_pooler"]["dense"]["kernel"]),
        )
        mngr.close()
