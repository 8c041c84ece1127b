"""TF BERT checkpoint import: name mapping + weight placement."""

import numpy as np
import pytest


def test_tf_name_mapping():
    from vilbert_tpu.core.tf_import import tf_name_to_flax

    cases = {
        "bert/embeddings/word_embeddings":
            "bert.embeddings.word_embeddings.embedding",
        "bert/embeddings/LayerNorm/gamma": "bert.embeddings.LayerNorm.weight",
        "bert/encoder/layer_3/attention/self/query/kernel":
            "bert.encoder.layer_3.attention_self.query.kernel",
        "bert/encoder/layer_0/attention/output/dense/bias":
            "bert.encoder.layer_0.attention_output.dense.bias",
        "bert/encoder/layer_11/intermediate/dense/kernel":
            "bert.encoder.layer_11.ffn.intermediate_dense.kernel",
        "bert/encoder/layer_11/output/LayerNorm/beta":
            "bert.encoder.layer_11.ffn.LayerNorm.bias",
        "cls/predictions/transform/dense/kernel":
            "cls.predictions.transform.dense.kernel",
        "cls/predictions/output_bias": "cls.predictions.bias",
    }
    for tf_name, expect in cases.items():
        assert tf_name_to_flax(tf_name) == expect, tf_name
    assert tf_name_to_flax("bert/pooler/dense/kernel") is None
    assert tf_name_to_flax("cls/seq_relationship/output_weights") is None
    assert tf_name_to_flax("bert/encoder/layer_0/attention/self/query/kernel/adam_m") is None


def test_tf_import_places_text_stream(tiny_config):
    import jax

    from vilbert_tpu.core.tf_import import import_tf_weights
    from vilbert_tpu.models.vilbert import ViLBERTForPretraining

    cfg = tiny_config
    model = ViLBERTForPretraining(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.ones((2, 8), np.int32),
        np.ones((2, 5, cfg.v_feature_size), np.float32),
        np.ones((2, 5, 5), np.float32),
    )["params"]

    rng = np.random.RandomState(0)
    word_emb = rng.randn(cfg.vocab_size, cfg.hidden_size).astype(np.float32)
    q_kernel = rng.randn(cfg.hidden_size, cfg.hidden_size).astype(np.float32)
    variables = {
        "bert/embeddings/word_embeddings": word_emb,
        "bert/encoder/layer_0/attention/self/query/kernel": q_kernel,
        "bert/pooler/dense/kernel": rng.randn(4, 4).astype(np.float32),
        "adam_v/whatever": rng.randn(3).astype(np.float32),
    }
    new_params, report = import_tf_weights(variables, params)
    assert len(report.loaded) == 2
    assert not report.unexpected
    np.testing.assert_array_equal(
        new_params["bert"]["embeddings"]["word_embeddings"]["embedding"], word_emb
    )
    np.testing.assert_array_equal(
        new_params["bert"]["encoder"]["layer_0"]["attention_self"]["query"]["kernel"],
        q_kernel,
    )
    # untouched params stay at init
    np.testing.assert_array_equal(
        np.asarray(new_params["bert"]["t_pooler"]["dense"]["kernel"]),
        np.asarray(params["bert"]["t_pooler"]["dense"]["kernel"]),
    )
