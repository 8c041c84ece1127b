"""Every shipped reference geometry loads and runs.

The reference publishes 10 model-geometry JSONs under config/ (plus weight
-name manifests, which are download metadata we don't need). `configs/`
mirrors them 1:1; this matrix proves each one (a) round-trips through
``ModelConfig.from_json_file`` with the exact reference values and (b)
executes a real tiny-batch forward at its full geometry — two-stream
configs through ``ViLBERTForVLTasks``, baseline (no v_* keys) configs
through ``BaseBertForVLTasks`` (the reference's ``--baseline`` path,
vilbert/basebert.py).

Also covers the RoBERTa variant end to end: config load + a torch→flax
checkpoint import at roberta geometry with logit parity. Note the reference
quirk this pinned down: RobertaEmbeddings' fairseq offset-2 positions
(vilbert/vilbert.py:370-394) are dead code — the BertEmbeddings base
recomputes position_ids unconditionally (vilbert.py:347-352), so the actual
reference behavior (and ours) is offset 0.
"""

import glob
import json
import os

import numpy as np
import pytest

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_JSONS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(CONFIG_DIR, "*.json"))
)
BASELINE = {"bert_base_baseline.json", "bert_large_baseline.json"}
TWO_STREAM = [n for n in ALL_JSONS if n not in BASELINE]


def _load(name):
    from vilbert_tpu.core.config import ModelConfig

    path = os.path.join(CONFIG_DIR, name)
    with open(path) as f:
        raw = json.load(f)
    return raw, ModelConfig.from_json_file(path)


def test_config_dir_mirrors_reference_geometries():
    """configs/ carries all 10 reference geometry JSONs (VERDICT r4 item 6)."""
    expected = {
        "bert_base_2layer_2conect.json",
        "bert_base_4layer_4conect.json",
        "bert_base_6layer_6conect.json",
        "bert_base_8layer_8conect.json",
        "bert_base_baseline.json",
        "bert_large_2layer_2conect.json",
        "bert_large_4layer_4conect.json",
        "bert_large_6layer_6conect.json",
        "bert_large_baseline.json",
        "roberta_base_6layer_6connect.json",
    }
    assert expected.issubset(set(ALL_JSONS)), set(ALL_JSONS) ^ expected


@pytest.mark.parametrize("name", ALL_JSONS)
def test_loads_with_reference_values(name):
    raw, cfg = _load(name)
    # every architecture key in the JSON must land verbatim in the config
    for key in (
        "hidden_size", "num_hidden_layers", "num_attention_heads",
        "intermediate_size", "vocab_size", "type_vocab_size",
        "max_position_embeddings",
    ):
        assert getattr(cfg, key) == raw[key], (name, key)
    if name in BASELINE:
        return
    for key in (
        "v_hidden_size", "v_num_hidden_layers", "v_num_attention_heads",
        "v_intermediate_size", "v_feature_size", "v_target_size",
        "bi_hidden_size", "bi_num_attention_heads", "bi_intermediate_size",
    ):
        assert getattr(cfg, key) == raw[key], (name, key)
    assert list(cfg.v_biattention_id) == raw["v_biattention_id"], name
    assert list(cfg.t_biattention_id) == raw["t_biattention_id"], name
    assert len(cfg.v_biattention_id) == len(cfg.t_biattention_id)
    # the static schedule must consume every layer exactly once
    sched = cfg.encoder_schedule()
    assert sorted(i for k, i in sched if k == "t") == list(
        range(cfg.num_hidden_layers)
    ), name
    assert sorted(i for k, i in sched if k == "v") == list(
        range(cfg.v_num_hidden_layers)
    ), name
    assert sum(1 for k, _ in sched if k == "c") == len(cfg.v_biattention_id)
    if name.startswith("roberta"):
        assert cfg.model == "roberta"
        assert cfg.type_vocab_size == 1


@pytest.mark.slow
@pytest.mark.parametrize("name", TWO_STREAM)
def test_two_stream_forward_full_geometry(name):
    """One real forward per geometry at tiny batch (full layer/width)."""
    import jax

    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

    _, cfg = _load(name)
    cfg = cfg.replace(compute_dtype="float32")
    rng = np.random.RandomState(0)
    B, T, R = 2, 12, 6
    ids = rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32)
    feats = rng.randn(B, R, cfg.v_feature_size).astype(np.float32)
    locs = rng.rand(B, R, 5).astype(np.float32)
    model = ViLBERTForVLTasks(cfg, num_labels=7, dropout_prob=0.0)
    params = model.init(jax.random.PRNGKey(0), ids, feats, locs)
    out = model.apply(params, ids, feats, locs)
    assert out.vil_prediction.shape == (B, 7)
    assert np.isfinite(np.asarray(out.vil_prediction)).all(), name


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(BASELINE))
def test_baseline_forward_full_geometry(name):
    """--baseline configs run through the single-stream model."""
    import jax

    from vilbert_tpu.models.basebert import BaseBertForVLTasks

    _, cfg = _load(name)
    cfg = cfg.replace(compute_dtype="float32")
    rng = np.random.RandomState(0)
    B, T, R = 2, 12, 6
    ids = rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32)
    feats = rng.randn(B, R, cfg.v_feature_size).astype(np.float32)
    locs = rng.rand(B, R, 5).astype(np.float32)
    model = BaseBertForVLTasks(cfg, num_labels=7, dropout_prob=0.0)
    params = model.init(jax.random.PRNGKey(0), ids, feats, locs)
    out = model.apply(params, ids, feats, locs)
    assert out.vil_prediction.shape == (B, 7)
    assert np.isfinite(np.asarray(out.vil_prediction)).all(), name


@pytest.mark.slow
def test_roberta_checkpoint_import_parity():
    """RoBERTa geometry: torch reference → importer → logit parity.

    Exercises the roberta-specific pieces at once: type_vocab_size=1,
    the dead-code position-offset quirk (see module docstring), and the
    standard gamma/beta-aware key mapping (reference key names are
    identical to bert, vilbert.py:1295-1296).
    """
    torch = pytest.importorskip("torch")
    import jax

    from tests.reference_loader import (
        load_reference_vilbert,
        make_reference_config,
        torch_state_dict_to_numpy,
    )
    from vilbert_tpu.core.config import ModelConfig
    from vilbert_tpu.core.importer import import_torch_state_dict
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

    ref_mod = load_reference_vilbert()
    cfg = ModelConfig(
        model="roberta", vocab_size=120, type_vocab_size=1,
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=66,
        v_feature_size=16, v_hidden_size=24, v_num_hidden_layers=2,
        v_num_attention_heads=4, v_intermediate_size=48, v_target_size=11,
        bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(2, 3),
        compute_dtype="float32", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
        v_attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    ref_model = ref_mod.VILBertForVLTasks(
        make_reference_config(ref_mod, cfg), num_labels=3129, dropout_prob=0.0
    )
    ref_model.eval()

    rng = np.random.RandomState(3)
    B, T, R = 3, 8, 5
    ids = rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int64)
    feats = rng.randn(B, R, cfg.v_feature_size).astype(np.float32)
    locs = rng.rand(B, R, 5).astype(np.float32)
    tt = np.zeros((B, T), np.int64)
    attn = np.ones((B, T), np.int64)
    img_attn = np.ones((B, R), np.int64)

    flax_model = ViLBERTForVLTasks(cfg, num_labels=3129, dropout_prob=0.0)
    variables = flax_model.init(
        jax.random.PRNGKey(0), ids.astype(np.int32), feats, locs
    )
    params, report = import_torch_state_dict(
        torch_state_dict_to_numpy(ref_model), variables["params"]
    )
    assert not report.unexpected, report.unexpected[:10]
    assert not report.missing, report.missing[:10]

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(ids), torch.from_numpy(feats),
            torch.from_numpy(locs), torch.from_numpy(tt),
            torch.from_numpy(attn), torch.from_numpy(img_attn),
        )
    out = flax_model.apply(
        {"params": params}, ids.astype(np.int32), feats, locs,
        tt.astype(np.int32), attn.astype(np.int32), img_attn.astype(np.int32),
    )
    np.testing.assert_allclose(
        np.asarray(out.vil_prediction), ref_out[0].numpy(), atol=3e-5
    )
