"""Golden parity: single-stream baseline vs reference vilbert/basebert.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_loader import load_reference_vilbert, torch_state_dict_to_numpy

pytestmark = pytest.mark.slow

ATOL = 3e-5


@pytest.fixture(scope="module")
def ref_basebert():
    load_reference_vilbert()  # installs stubs + sys.path
    import importlib

    return importlib.import_module("vilbert.basebert")


def _tiny_cfg():
    from vilbert_tpu.core.config import ModelConfig

    return ModelConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        v_feature_size=2048,  # basebert hardcodes Linear(2048, hidden)
        v_target_size=1601,   # and a 1601-way image head
        v_hidden_size=32, v_num_hidden_layers=1, v_num_attention_heads=4,
        v_intermediate_size=32, bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0,), t_biattention_id=(0,),
        compute_dtype="float32", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
        v_attention_probs_dropout_prob=0.0,
    )


def test_basebert_vltasks_parity(ref_basebert):
    import jax

    from vilbert_tpu.core.importer import import_torch_state_dict
    from vilbert_tpu.models.basebert import BaseBertForVLTasks

    cfg = _tiny_cfg()
    ref_cfg = ref_basebert.BertConfig.from_dict(cfg.to_dict())
    torch.manual_seed(0)
    ref_model = ref_basebert.BaseBertForVLTasks(
        ref_cfg, num_labels=13, dropout_prob=0.0
    )
    ref_model.eval()

    rng = np.random.RandomState(1)
    B, T, R = 3, 8, 5
    ids = rng.randint(1, 90, (B, T)).astype(np.int64)
    feats = rng.randn(B, R, 2048).astype(np.float32)
    boxes = rng.rand(B, R, 5).astype(np.float32)
    tt = np.zeros((B, T), np.int64)
    attn = np.ones((B, T), np.int64); attn[:, -1] = 0
    imga = np.ones((B, R), np.int64); imga[:, -1] = 0

    model = BaseBertForVLTasks(cfg, num_labels=13, dropout_prob=0.0)
    variables = model.init(jax.random.PRNGKey(0), ids.astype(np.int32), feats, boxes)
    sd = torch_state_dict_to_numpy(ref_model)
    params, report = import_torch_state_dict(
        sd, variables["params"], family="basebert"
    )
    assert not report.unexpected, report.unexpected[:10]
    assert not report.missing, report.missing[:10]

    with torch.no_grad():
        ref_out = ref_model(
            torch.tensor(ids), torch.tensor(feats), torch.tensor(boxes),
            torch.tensor(tt), torch.tensor(attn), torch.tensor(imga),
        )
    out = model.apply(
        {"params": params}, ids.astype(np.int32), feats, boxes,
        tt.astype(np.int32), attn.astype(np.int32), imga.astype(np.int32),
    )
    names = ["vil_prediction", "vil_logit", "vil_binary_prediction",
             "vision_prediction", "vision_logit", "linguisic_prediction",
             "linguisic_logit"]
    for i, name in enumerate(names):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), ref_out[i].numpy(),
            atol=ATOL, rtol=1e-4, err_msg=name,
        )
