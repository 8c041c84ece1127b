"""Training-layer tests: optimizer groups, schedules, controllers, and an
end-to-end pretraining smoke on the 8-device virtual mesh."""

import numpy as np
import pytest


class TestSchedules:
    def test_warmup_linear(self):
        from vilbert_tpu.train.optim import warmup_linear_schedule

        s = warmup_linear_schedule(1.0, 100, 0.1)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(5)), 0.5)
        np.testing.assert_allclose(float(s(10)), 1.0)
        np.testing.assert_allclose(float(s(55)), 0.5)
        np.testing.assert_allclose(float(s(100)), 0.0)

    def test_warmup_constant(self):
        from vilbert_tpu.train.optim import warmup_constant_schedule

        s = warmup_constant_schedule(2.0, 100, 0.1)
        np.testing.assert_allclose(float(s(5)), 1.0)
        np.testing.assert_allclose(float(s(80)), 2.0)


class TestController:
    def test_stop_and_resume_sequence(self):
        """Replicates the reference manual scenario (tools/test_controller.py):
        plateau -> in_stop, score collapse -> resume."""
        from vilbert_tpu.train.controllers import StopOnPlateau

        c = StopOnPlateau(mode="max", patience=3, continue_threshold=0.005)
        for s in [0.1, 0.2, 0.3, 0.31]:
            c.step(s)
        assert not c.in_stop
        for s in [0.31, 0.31, 0.31, 0.31]:
            c.step(s)
        assert c.in_stop          # patience 3 exceeded
        c.step(0.29)              # dropped > 0.5% below best -> resume
        assert not c.in_stop

    def test_multi_task_gating(self):
        from vilbert_tpu.train.controllers import MultiTaskStopController

        m = MultiTaskStopController(["TASK1", "TASK2"], patience=1, train_iter_gap=4)
        assert m.should_train("TASK1", 3)
        for _ in range(5):
            m.step("TASK1", 0.5)
        assert m.controllers["TASK1"].in_stop
        assert not m.should_train("TASK1", 3)
        assert m.should_train("TASK1", 4)   # every train_iter_gap
        m.reset_all()
        assert not m.controllers["TASK1"].in_stop


class TestOptimGroups:
    def test_labels_and_freeze(self, tiny_config):
        import jax

        from vilbert_tpu.core.config import OptimizerConfig
        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
        from vilbert_tpu.train.optim import label_params

        model = ViLBERTForVLTasks(tiny_config)
        params = model.init(
            jax.random.PRNGKey(0),
            np.ones((2, 8), np.int32),
            np.ones((2, 5, tiny_config.v_feature_size), np.float32),
            np.ones((2, 5, 5), np.float32),
        )["params"]
        labels = label_params(params, head_lr=1e-4, freeze_prefix="bert.embeddings")
        flat = jax.tree_util.tree_leaves_with_path(labels)
        by_label = {}
        for path, lab in flat:
            by_label.setdefault(lab, []).append(path)
        assert "head" in by_label and "base" in by_label and "frozen" in by_label

    def test_integer_freeze_expansion(self, tiny_config):
        """--freeze N expands to text embeddings + text layers 0..N
        (reference train_tasks.py:381-393) and labels exactly those frozen."""
        import jax

        from vilbert_tpu.cli.train_tasks import freeze_prefixes
        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
        from vilbert_tpu.train.optim import label_params, path_str

        assert freeze_prefixes("-1") == ()
        assert freeze_prefixes("") == ()
        assert freeze_prefixes("bert.encoder") == ("bert.encoder",)
        assert freeze_prefixes("a, b") == ("a", "b")
        pfx = freeze_prefixes("0")
        # both family spellings (vilbert bert.encoder.layer_N, basebert
        # bert.layer_N); unmatched prefixes are inert
        assert pfx == (
            "bert.embeddings.", "bert.encoder.layer_0.", "bert.layer_0.",
        )

        model = ViLBERTForVLTasks(tiny_config)
        params = model.init(
            jax.random.PRNGKey(0),
            np.ones((2, 8), np.int32),
            np.ones((2, 5, tiny_config.v_feature_size), np.float32),
            np.ones((2, 5, 5), np.float32),
        )["params"]
        labels = label_params(params, freeze_prefix=pfx)
        import jax.tree_util as jtu

        for path, lab in jtu.tree_leaves_with_path(labels):
            p = path_str(path)
            want = ("frozen" if p.startswith(pfx) else lab)
            assert lab == want
            if p.startswith("bert.encoder.layer_1."):
                assert lab != "frozen", p
            if p.startswith("bert.embeddings."):
                assert lab == "frozen", p

    def test_vision_scratch_labels(self, tiny_config):
        """vision_scratch: everything outside the text-BERT manifest trains
        at head lr (reference train_tasks.py:400-411)."""
        import jax

        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
        from vilbert_tpu.train.optim import label_params, path_str

        model = ViLBERTForVLTasks(tiny_config)
        params = model.init(
            jax.random.PRNGKey(0),
            np.ones((2, 8), np.int32),
            np.ones((2, 5, tiny_config.v_feature_size), np.float32),
            np.ones((2, 5, 5), np.float32),
        )["params"]
        labels = label_params(params, head_lr=1e-4, vision_scratch=True)
        for path, lab in jax.tree_util.tree_leaves_with_path(labels):
            p = path_str(path)
            if p.startswith(("bert.embeddings.", "bert.encoder.layer_")):
                assert lab == "base", p
            else:
                assert lab == "head", p

    @pytest.mark.slow
    def test_frozen_params_unchanged(self, tiny_config):
        import jax
        import jax.numpy as jnp

        from vilbert_tpu.core.config import OptimizerConfig
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.parallel.train_step import TrainState, make_train_step
        from vilbert_tpu.train.optim import build_optimizer

        model = ViLBERTForPretraining(tiny_config)
        B, T, R = 2, 8, 5
        batch = {
            "input_ids": np.ones((B, T), np.int32),
            "image_feat": np.ones((B, R, tiny_config.v_feature_size), np.float32),
            "image_loc": np.ones((B, R, 5), np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "lm_label_ids": np.full((B, T), -1, np.int32),
            "image_label": np.full((B, R - 1), 1, np.int32),
            "image_target": np.ones((B, R - 1, tiny_config.v_target_size), np.float32)
            / tiny_config.v_target_size,
            "is_next": np.zeros((B,), np.int32),
        }
        batch["lm_label_ids"][:, 1] = 5
        params = model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["image_feat"],
            batch["image_loc"],
        )["params"]
        opt_cfg = OptimizerConfig(learning_rate=1e-2, schedule="constant")
        tx, _ = build_optimizer(
            opt_cfg, params, 100, freeze_prefix="bert.embeddings"
        )
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        loss_fn = make_pretrain_loss_fn(model, tiny_config, deterministic=True)
        step_fn = make_train_step(loss_fn, tx, jit=True)
        state = TrainState.create(params, tx)
        frozen_before = jax.device_get(
            state.params["bert"]["embeddings"]["word_embeddings"]["embedding"]
        )
        other_before = jax.device_get(
            state.params["bert"]["t_pooler"]["dense"]["kernel"]
        )
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        frozen_after = jax.device_get(
            state.params["bert"]["embeddings"]["word_embeddings"]["embedding"]
        )
        other_after = jax.device_get(
            state.params["bert"]["t_pooler"]["dense"]["kernel"]
        )
        np.testing.assert_array_equal(frozen_before, frozen_after)
        assert np.abs(other_before - other_after).max() > 0
        assert np.isfinite(float(metrics["loss"]))


class TestEndToEnd:
    @pytest.mark.slow
    def test_pretrain_loss_decreases_on_mesh(self, tiny_config):
        """Synthetic CC pretraining on the 8-device CPU mesh: loss decreases,
        params stay replicated."""
        import jax

        from vilbert_tpu.core.config import OptimizerConfig
        from vilbert_tpu.data.concap import ConceptCapLoader, ConceptCapSampleConfig
        from vilbert_tpu.data.feature_store import InMemoryFeatureStore
        from vilbert_tpu.data.tokenization import HashTokenizer
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicate_pytree,
        )
        from vilbert_tpu.parallel.train_step import TrainState, make_train_step
        from vilbert_tpu.train.optim import build_optimizer
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        cfg = tiny_config.replace(v_target_size=7)
        tok = HashTokenizer(vocab_size=cfg.vocab_size)
        store = InMemoryFeatureStore.synthetic(
            num_images=64, num_boxes=5, feature_dim=cfg.v_feature_size, target_dim=7
        )
        captions = {k: f"object number {k} in a scene" for k in store.keys()}
        loader = ConceptCapLoader(
            store, captions, tok, batch_size=16,
            cfg=ConceptCapSampleConfig(
                seq_len=10, region_len=5, feature_dim=cfg.v_feature_size,
                target_dim=7,
            ),
            seed=0,
        )
        mesh = make_mesh()
        assert mesh.devices.size == 8

        model = ViLBERTForPretraining(cfg)
        batch0 = next(iter(loader))
        batch0.pop("image_id")
        params = model.init(
            jax.random.PRNGKey(0), batch0["input_ids"], batch0["image_feat"],
            batch0["image_loc"],
        )["params"]
        tx, _ = build_optimizer(
            OptimizerConfig(learning_rate=5e-3, schedule="constant"), params, 100
        )
        state = TrainState.create(params, tx)
        state = TrainState(*replicate_pytree(tuple(state), mesh))
        loss_fn = make_pretrain_loss_fn(model, cfg, deterministic=True)
        step_fn = make_train_step(loss_fn, tx)

        sharding = batch_sharding(mesh)
        losses = []
        rng = jax.random.PRNGKey(0)
        for step in range(8):
            for b in loader:
                b.pop("image_id", None)
                b = jax.tree.map(lambda x: jax.device_put(x, sharding), b)
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, b, sub)
                losses.append(float(metrics["loss"]))
                break
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        # params remain fully replicated across the 8 devices
        kernel = state.params["bert"]["t_pooler"]["dense"]["kernel"]
        assert kernel.sharding.is_fully_replicated

    @pytest.mark.slow
    def test_grad_accum_equivalence(self, tiny_config):
        """accum=2 over half-batches == accum=1 over the full batch."""
        import jax

        from vilbert_tpu.core.config import OptimizerConfig
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.parallel.train_step import TrainState, make_train_step
        from vilbert_tpu.train.optim import build_optimizer
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        cfg = tiny_config.replace(v_target_size=7)
        model = ViLBERTForPretraining(cfg)
        B, T, R = 4, 8, 5
        rng_np = np.random.RandomState(0)
        batch = {
            "input_ids": rng_np.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
            "image_feat": rng_np.randn(B, R, cfg.v_feature_size).astype(np.float32),
            "image_loc": rng_np.rand(B, R, 5).astype(np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "lm_label_ids": np.full((B, T), -1, np.int32),
            "image_label": np.full((B, R - 1), 1, np.int32),
            "image_target": (np.ones((B, R - 1, 7)) / 7).astype(np.float32),
            "is_next": np.zeros((B,), np.int32),
        }
        batch["lm_label_ids"][:, 1] = 5
        params_np = jax.device_get(
            model.init(
                jax.random.PRNGKey(0), batch["input_ids"], batch["image_feat"],
                batch["image_loc"],
            )["params"]
        )
        opt = OptimizerConfig(learning_rate=1e-2, schedule="constant",
                              weight_decay=0.0)
        loss_fn = make_pretrain_loss_fn(model, cfg, deterministic=True)

        # the train step donates its input state — give each run fresh buffers
        params = jax.tree.map(jax.numpy.asarray, params_np)
        tx1, _ = build_optimizer(opt, params, 10)
        s1 = TrainState.create(params, tx1)
        s1, m1 = make_train_step(loss_fn, tx1)(s1, batch, jax.random.PRNGKey(9))

        params = jax.tree.map(jax.numpy.asarray, params_np)
        tx2, _ = build_optimizer(opt, params, 10)
        s2 = TrainState.create(params, tx2)
        micro = jax.tree.map(lambda x: x.reshape(2, 2, *x.shape[1:]), batch)
        s2, m2 = make_train_step(loss_fn, tx2, grad_accum=2)(
            s2, micro, jax.random.PRNGKey(9)
        )
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        k1 = np.asarray(s1.params["bert"]["t_pooler"]["dense"]["kernel"])
        k2 = np.asarray(s2.params["bert"]["t_pooler"]["dense"]["kernel"])
        np.testing.assert_allclose(k1, k2, atol=2e-6)

        # grad_dtype="bfloat16" (bf16 gradient storage, fp32 update math)
        # tracks the fp32-grad trajectory to bf16 mantissa tolerance, params
        # stay fp32, and it composes with grad accumulation.
        import jax.numpy as jnp

        for ga, b in ((1, batch), (2, micro)):
            params = jax.tree.map(jnp.asarray, params_np)
            tx3, _ = build_optimizer(opt, params, 10)
            s3 = TrainState.create(params, tx3)
            s3, m3 = make_train_step(
                loss_fn, tx3, grad_accum=ga, grad_dtype="bfloat16"
            )(s3, b, jax.random.PRNGKey(9))
            assert s3.params["bert"]["t_pooler"]["dense"]["kernel"].dtype == jnp.float32
            np.testing.assert_allclose(float(m1["loss"]), float(m3["loss"]), rtol=1e-2)
            k3 = np.asarray(s3.params["bert"]["t_pooler"]["dense"]["kernel"])
            np.testing.assert_allclose(k1, k3, atol=2e-3)


class TestLMGather:
    def test_gathered_lm_loss_matches_full(self, tiny_config):
        """lm_gather=K projects only masked positions through the LM head;
        the loss must be identical to the full-sequence projection whenever
        every sample has <= K masked tokens."""
        import jax

        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        model = ViLBERTForPretraining(tiny_config)
        B, T, R = 3, 10, 5
        rng = np.random.RandomState(0)
        batch = {
            "input_ids": rng.randint(1, tiny_config.vocab_size, (B, T)).astype(
                np.int32
            ),
            "image_feat": rng.randn(B, R, tiny_config.v_feature_size).astype(
                np.float32
            ),
            "image_loc": rng.rand(B, R, 5).astype(np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "lm_label_ids": np.full((B, T), -1, np.int32),
            "image_label": np.full((B, R - 1), -1, np.int32),
            "image_target": np.ones(
                (B, R - 1, tiny_config.v_target_size), np.float32
            ) / tiny_config.v_target_size,
            "is_next": np.zeros((B, B), np.int32)[0],
        }
        # irregular masked counts per sample (3, 1, 0), all <= K=4
        batch["lm_label_ids"][0, [1, 4, 7]] = [5, 6, 7]
        batch["lm_label_ids"][1, [2]] = [9]
        params = model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["image_feat"],
            batch["image_loc"],
        )["params"]

        full = make_pretrain_loss_fn(model, tiny_config, deterministic=True)
        gathered = make_pretrain_loss_fn(
            model, tiny_config, deterministic=True, lm_gather=4
        )
        key = jax.random.PRNGKey(1)
        loss_f, m_f = full(params, batch, key)
        loss_g, m_g = gathered(params, batch, key)
        np.testing.assert_allclose(float(loss_f), float(loss_g), rtol=1e-6)
        np.testing.assert_allclose(
            float(m_f["masked_loss_t"]), float(m_g["masked_loss_t"]), rtol=1e-6
        )

        # overflow: K=2 < 3 masked tokens in sample 0 -> first 2 in position
        # order kept, numerator/denominator both exclude the overflow
        g2 = make_pretrain_loss_fn(
            model, tiny_config, deterministic=True, lm_gather=2
        )
        _, m_g2 = g2(params, batch, key)
        assert np.isfinite(float(m_g2["masked_loss_t"]))


class TestImgGather:
    def test_gathered_img_loss_matches_full(self, tiny_config):
        """img_gather=K projects only masked regions through the image head;
        the masked-region KL loss must be identical to the full projection
        whenever every sample has <= K masked regions."""
        import jax

        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        model = ViLBERTForPretraining(tiny_config)
        B, T, R = 3, 10, 6
        rng = np.random.RandomState(1)
        target = rng.rand(B, R - 1, tiny_config.v_target_size).astype(np.float32)
        target /= target.sum(-1, keepdims=True)
        batch = {
            "input_ids": rng.randint(1, tiny_config.vocab_size, (B, T)).astype(
                np.int32
            ),
            "image_feat": rng.randn(B, R, tiny_config.v_feature_size).astype(
                np.float32
            ),
            "image_loc": rng.rand(B, R, 5).astype(np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "lm_label_ids": np.full((B, T), -1, np.int32),
            "image_label": np.full((B, R - 1), -1, np.int32),
            "image_target": target,
            "is_next": np.zeros((B,), np.int32),
        }
        # irregular masked-region counts per sample (3, 1, 0), all <= K=3
        batch["image_label"][0, [0, 2, 4]] = 1
        batch["image_label"][1, [3]] = 1
        params = model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["image_feat"],
            batch["image_loc"],
        )["params"]

        key = jax.random.PRNGKey(1)
        full = make_pretrain_loss_fn(model, tiny_config, deterministic=True)
        gathered = make_pretrain_loss_fn(
            model, tiny_config, deterministic=True, img_gather=3
        )
        loss_f, m_f = full(params, batch, key)
        loss_g, m_g = gathered(params, batch, key)
        np.testing.assert_allclose(float(loss_f), float(loss_g), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_f["masked_loss_v"]), float(m_g["masked_loss_v"]), rtol=1e-5
        )

        # overflow: K=2 < 3 masked regions in sample 0 -> loss stays finite,
        # overflow rows excluded from numerator and denominator alike
        g2 = make_pretrain_loss_fn(
            model, tiny_config, deterministic=True, img_gather=2
        )
        _, m_g2 = g2(params, batch, key)
        assert np.isfinite(float(m_g2["masked_loss_v"]))

    def test_gathered_img_loss_matches_full_basebert(self, tiny_config):
        """The single-stream baseline's img_positions path
        (basebert.py BaseBertForPretraining) must be loss-identical to the
        full image-head projection, same contract as the vilbert path —
        the --baseline CLI flag routes --img_gather here."""
        import jax

        from vilbert_tpu.models.basebert import BaseBertForPretraining
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        model = BaseBertForPretraining(tiny_config)
        B, T, R = 3, 10, 6
        rng = np.random.RandomState(7)
        target = rng.rand(B, R - 1, tiny_config.v_target_size).astype(np.float32)
        target /= target.sum(-1, keepdims=True)
        batch = {
            "input_ids": rng.randint(1, tiny_config.vocab_size, (B, T)).astype(
                np.int32
            ),
            "image_feat": rng.randn(B, R, tiny_config.v_feature_size).astype(
                np.float32
            ),
            "image_loc": rng.rand(B, R, 5).astype(np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "lm_label_ids": np.full((B, T), -1, np.int32),
            "image_label": np.full((B, R - 1), -1, np.int32),
            "image_target": target,
            "is_next": np.zeros((B,), np.int32),
        }
        batch["image_label"][0, [1, 3, 4]] = 1
        batch["image_label"][2, [0]] = 1
        batch["lm_label_ids"][1, [2, 5]] = [4, 8]
        params = model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["image_feat"],
            batch["image_loc"],
        )["params"]

        key = jax.random.PRNGKey(1)
        full = make_pretrain_loss_fn(model, tiny_config, deterministic=True)
        gathered = make_pretrain_loss_fn(
            model, tiny_config, deterministic=True, img_gather=3, lm_gather=4
        )
        loss_f, m_f = full(params, batch, key)
        loss_g, m_g = gathered(params, batch, key)
        np.testing.assert_allclose(float(loss_f), float(loss_g), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_f["masked_loss_v"]), float(m_g["masked_loss_v"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m_f["masked_loss_t"]), float(m_g["masked_loss_t"]), rtol=1e-5
        )

    def test_img_gather_ignored_for_nce(self, tiny_config):
        """visual_target=2 (NCE) samples negatives across all regions —
        img_gather must fall back to the full projection there."""
        import dataclasses

        import jax

        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

        cfg = dataclasses.replace(tiny_config, visual_target=2, num_negative=4)
        model = ViLBERTForPretraining(cfg)
        B, T, R = 2, 8, 5
        rng = np.random.RandomState(2)
        batch = {
            "input_ids": rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
            "image_feat": rng.randn(B, R, cfg.v_feature_size).astype(np.float32),
            "image_loc": rng.rand(B, R, 5).astype(np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "lm_label_ids": np.full((B, T), -1, np.int32),
            "image_label": np.where(
                rng.rand(B, R - 1) < 0.5, 1, -1
            ).astype(np.int32),
            "image_target": rng.randn(B, R - 1, cfg.v_target_size).astype(
                np.float32
            ),
            "is_next": np.zeros((B,), np.int32),
        }
        params = model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["image_feat"],
            batch["image_loc"],
        )["params"]
        key = jax.random.PRNGKey(3)
        full = make_pretrain_loss_fn(model, cfg, deterministic=True)
        gathered = make_pretrain_loss_fn(
            model, cfg, deterministic=True, img_gather=3
        )
        loss_f, _ = full(params, batch, key)
        loss_g, _ = gathered(params, batch, key)
        np.testing.assert_allclose(float(loss_f), float(loss_g), rtol=1e-6)


class TestFusedQKV:
    def test_fused_matches_unfused(self, tiny_config):
        """fused_qkv=True runs one [D,3H] GEMM per attention but must produce
        the same outputs from the same (three-way) param tree."""
        import dataclasses

        import jax

        from vilbert_tpu.models.vilbert import ViLBERTForPretraining

        B, T, R = 2, 9, 5
        rng = np.random.RandomState(0)
        ids = rng.randint(1, tiny_config.vocab_size, (B, T)).astype(np.int32)
        feat = rng.randn(B, R, tiny_config.v_feature_size).astype(np.float32)
        loc = rng.rand(B, R, 5).astype(np.float32)

        plain = ViLBERTForPretraining(
            dataclasses.replace(tiny_config, fused_qkv=False)
        )
        fused = ViLBERTForPretraining(
            dataclasses.replace(tiny_config, fused_qkv=True)
        )
        params = plain.init(jax.random.PRNGKey(0), ids, feat, loc)["params"]
        out_p = plain.apply({"params": params}, ids, feat, loc)
        out_f = fused.apply({"params": params}, ids, feat, loc)
        np.testing.assert_allclose(
            np.asarray(out_p.prediction_scores_t),
            np.asarray(out_f.prediction_scores_t), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_p.prediction_scores_v),
            np.asarray(out_f.prediction_scores_v), atol=1e-5,
        )
