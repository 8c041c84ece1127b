"""Golden parity tests: our flax models vs the reference torch implementation.

Loads the actual reference code (read-only) on CPU, randomly initializes it,
imports the state_dict through vilbert_tpu.core.importer, and checks logits
to fp32 tolerance — the "golden logit tests vs reference checkpoints" of
SURVEY.md §4/§7.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_loader import (
    load_reference_vilbert,
    make_reference_config,
    torch_state_dict_to_numpy,
)

pytestmark = pytest.mark.slow

ATOL = 3e-5


def _random_inputs(rng, batch=4, seq=9, regions=6, feat=16, pad=True):
    input_ids = rng.randint(1, 90, size=(batch, seq)).astype(np.int64)
    features = rng.randn(batch, regions, feat).astype(np.float32)
    boxes = rng.rand(batch, regions, 5).astype(np.float32)
    token_type = np.zeros((batch, seq), np.int64)
    attn = np.ones((batch, seq), np.int64)
    img_attn = np.ones((batch, regions), np.int64)
    if pad:
        attn[:, -2:] = 0
        img_attn[:, -1:] = 0
    return input_ids, features, boxes, token_type, attn, img_attn


def _import_into_flax(ref_model, flax_model, init_args, init_kwargs=None):
    import jax

    from vilbert_tpu.core.importer import import_torch_state_dict

    init_kwargs = init_kwargs or {}
    variables = flax_model.init(jax.random.PRNGKey(0), *init_args, **init_kwargs)
    sd = torch_state_dict_to_numpy(ref_model)
    params, report = import_torch_state_dict(sd, variables["params"])
    assert not report.unexpected, f"unexpected keys: {report.unexpected[:10]}"
    assert not report.missing, f"missing params: {report.missing[:10]}"
    return {"params": params}


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_vilbert()


class TestVLTasksParity:
    @pytest.fixture(scope="class", params=["plain", "task_tokens", "dynamic"])
    def setup(self, request, ref_mod):
        from vilbert_tpu.core.config import ModelConfig
        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

        cfg = ModelConfig(
            vocab_size=99, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, v_feature_size=16, v_hidden_size=24,
            v_num_hidden_layers=2, v_num_attention_heads=4,
            v_intermediate_size=48, v_target_size=11, bi_hidden_size=32,
            bi_num_attention_heads=4, v_biattention_id=(0, 1),
            t_biattention_id=(2, 3), compute_dtype="float32",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
            task_specific_tokens=(request.param == "task_tokens"),
            dynamic_attention=(request.param == "dynamic"),
        )
        torch.manual_seed(0)
        ref_cfg = make_reference_config(ref_mod, cfg)
        ref_model = ref_mod.VILBertForVLTasks(ref_cfg, num_labels=3129, dropout_prob=0.0)
        ref_model.eval()

        rng = np.random.RandomState(1)
        inputs = _random_inputs(rng)
        flax_model = ViLBERTForVLTasks(cfg, dropout_prob=0.0)
        ids, feats, boxes, tt, attn, img_attn = inputs
        task_ids = np.full((ids.shape[0], 1), 2, np.int64) if cfg.task_specific_tokens else None
        init_args = (ids.astype(np.int32), feats, boxes)
        variables = _import_into_flax(
            ref_model, flax_model, init_args,
            {"task_ids": None if task_ids is None else task_ids.astype(np.int32)},
        )
        return cfg, ref_model, flax_model, variables, inputs, task_ids

    def test_all_heads_match(self, setup):
        cfg, ref_model, flax_model, variables, inputs, task_ids = setup
        ids, feats, boxes, tt, attn, img_attn = inputs

        with torch.no_grad():
            ref_out = ref_model(
                torch.tensor(ids), torch.tensor(feats), torch.tensor(boxes),
                torch.tensor(tt), torch.tensor(attn), torch.tensor(img_attn),
                task_ids=None if task_ids is None else torch.tensor(task_ids),
            )
        out = flax_model.apply(
            variables, ids.astype(np.int32), feats, boxes, tt.astype(np.int32),
            attn.astype(np.int32), img_attn.astype(np.int32),
            task_ids=None if task_ids is None else task_ids.astype(np.int32),
        )
        names = [
            "vil_prediction", "vil_prediction_gqa", "vil_logit",
            "vil_binary_prediction", "vil_tri_prediction", "vision_prediction",
            "vision_logit", "linguisic_prediction", "linguisic_logit",
        ]
        for i, name in enumerate(names):
            ref_v = ref_out[i].numpy()
            got = np.asarray(getattr(out, name))
            np.testing.assert_allclose(
                got, ref_v, atol=ATOL, rtol=1e-4, err_msg=name
            )


class TestPretrainParity:
    def test_pretrain_logits_match(self, ref_mod):
        from vilbert_tpu.core.config import ModelConfig
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining

        cfg = ModelConfig(
            vocab_size=99, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, v_feature_size=16, v_hidden_size=24,
            v_num_hidden_layers=2, v_num_attention_heads=4,
            v_intermediate_size=48, v_target_size=11, bi_hidden_size=32,
            bi_num_attention_heads=4, v_biattention_id=(0, 1),
            t_biattention_id=(2, 3), compute_dtype="float32",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        ref_cfg = make_reference_config(ref_mod, cfg)
        ref_model = ref_mod.BertForMultiModalPreTraining(ref_cfg)
        ref_model.eval()

        rng = np.random.RandomState(2)
        ids, feats, boxes, tt, attn, img_attn = _random_inputs(rng)
        flax_model = ViLBERTForPretraining(cfg)
        variables = _import_into_flax(
            ref_model, flax_model, (ids.astype(np.int32), feats, boxes)
        )

        with torch.no_grad():
            ref_t, ref_v, ref_rel, _ = ref_model(
                torch.tensor(ids), torch.tensor(feats), torch.tensor(boxes),
                torch.tensor(tt), torch.tensor(attn), torch.tensor(img_attn),
            )
        out = flax_model.apply(
            variables, ids.astype(np.int32), feats, boxes, tt.astype(np.int32),
            attn.astype(np.int32), img_attn.astype(np.int32),
        )
        np.testing.assert_allclose(
            np.asarray(out.prediction_scores_t), ref_t.numpy(), atol=ATOL, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.prediction_scores_v), ref_v.numpy(), atol=ATOL, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.seq_relationship_score), ref_rel.numpy(), atol=ATOL, rtol=1e-4
        )

    def test_pretrain_losses_match(self, ref_mod):
        """Full loss parity for visual_target 0 (KL) and 1 (MSE)."""
        from vilbert_tpu.core.config import ModelConfig
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.train.losses import pretrain_losses

        for visual_target in (0, 1):
            cfg = ModelConfig(
                vocab_size=99, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64, v_feature_size=16, v_hidden_size=24,
                v_num_hidden_layers=2, v_num_attention_heads=4,
                v_intermediate_size=48,
                v_target_size=(11 if visual_target == 0 else 16),
                bi_hidden_size=32, bi_num_attention_heads=4,
                v_biattention_id=(0, 1), t_biattention_id=(0, 1),
                compute_dtype="float32", hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
                v_attention_probs_dropout_prob=0.0, visual_target=visual_target,
            )
            torch.manual_seed(3)
            ref_cfg = make_reference_config(ref_mod, cfg)
            ref_model = ref_mod.BertForMultiModalPreTraining(ref_cfg)
            ref_model.eval()

            rng = np.random.RandomState(4)
            B, T, R = 4, 9, 6
            ids, feats, boxes, tt, attn, img_attn = _random_inputs(rng, B, T, R)
            lm_labels = np.full((B, T), -1, np.int64)
            lm_labels[:, 2] = rng.randint(0, 99, B)
            image_label = np.full((B, R - 1), -1, np.int64)
            image_label[:, 1] = 1
            if visual_target == 0:
                tgt = rng.rand(B, R - 1, 11).astype(np.float32)
                tgt /= tgt.sum(-1, keepdims=True)
            else:
                tgt = rng.randn(B, R - 1, 16).astype(np.float32)
            nsp = rng.randint(0, 2, B).astype(np.int64)

            with torch.no_grad():
                ref_lm, ref_img, ref_nsp = ref_model(
                    torch.tensor(ids), torch.tensor(feats), torch.tensor(boxes),
                    torch.tensor(tt), torch.tensor(attn), torch.tensor(img_attn),
                    masked_lm_labels=torch.tensor(lm_labels),
                    image_label=torch.tensor(image_label),
                    image_target=torch.tensor(tgt),
                    next_sentence_label=torch.tensor(nsp),
                )
            flax_model = ViLBERTForPretraining(cfg)
            variables = _import_into_flax(
                ref_model, flax_model, (ids.astype(np.int32), feats, boxes)
            )
            out = flax_model.apply(
                variables, ids.astype(np.int32), feats, boxes, tt.astype(np.int32),
                attn.astype(np.int32), img_attn.astype(np.int32),
            )
            losses = pretrain_losses(
                out, lm_labels, image_label, tgt, nsp,
                visual_target=visual_target,
            )
            np.testing.assert_allclose(
                float(losses.masked_lm_loss), float(ref_lm), atol=1e-5, rtol=1e-4
            )
            np.testing.assert_allclose(
                float(losses.masked_img_loss), float(ref_img), atol=1e-5, rtol=1e-4
            )
            np.testing.assert_allclose(
                float(losses.next_sentence_loss), float(ref_nsp), atol=1e-5, rtol=1e-4
            )
