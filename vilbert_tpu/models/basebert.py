"""Single-stream baseline ("BaseBert").

Rebuild of the reference vilbert/basebert.py (978 LoC; selected by
``--baseline``, train_tasks.py:232-237): text and image-region embeddings are
concatenated into ONE sequence and run through a vanilla BERT encoder — the
ablation baseline against the two-stream ViLBERT.

Reuses this package's TextLayer/heads blocks; differences vs vilbert.py:
- image embeddings project into ``hidden_size`` and add a token-type
  embedding with type 1 for image tokens (basebert.py:324-360, :728-731),
- the combined sequence mask is the concatenation of the two masks
  (:761-764),
- one pooler over the [CLS] position; heads read the text/image sub-slices
  of the combined sequence (:933-936),
- SimpleClassifier here is Linear→ReLU→dropout→Linear with weight_norm
  (:965-978); we use plain Linears (weight_norm folds into the kernel at
  import time).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vilbert_tpu.core.config import ModelConfig
from vilbert_tpu.models.layers import LayerNorm, TextLayer, _dense
from vilbert_tpu.models.vilbert import LMPredictionHead, PredictionHeadTransform
from vilbert_tpu.ops.attention import make_additive_mask


class BaseImageEmbeddings(nn.Module):
    """Region features + location + token-type into hidden_size
    (basebert.py:324-360)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, features, locations, token_type_ids, *, deterministic=True):
        cfg = self.config
        emb = (
            _dense(cfg, cfg.hidden_size, "image_embeddings")(features)
            + _dense(cfg, cfg.hidden_size, "image_location_embeddings")(locations)
            + nn.Embed(
                cfg.type_vocab_size, cfg.hidden_size,
                embedding_init=nn.initializers.normal(cfg.initializer_range),
                param_dtype=jnp.dtype(cfg.param_dtype),
                name="token_type_embeddings",
            )(token_type_ids)
        )
        emb = LayerNorm(param_dtype=jnp.dtype(cfg.param_dtype), name="LayerNorm")(emb)
        emb = nn.Dropout(cfg.hidden_dropout_prob)(emb, deterministic=deterministic)
        return emb.astype(jnp.dtype(cfg.compute_dtype))


class BaseBertModelOutput(NamedTuple):
    sequence: jax.Array
    pooled: jax.Array


class BaseBertModel(nn.Module):
    """Single-stream encoder over [text ; image] (basebert.py:658-774)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        from vilbert_tpu.models.vilbert import TextEmbeddings

        self.embeddings = TextEmbeddings(cfg)
        self.image_embeddings = BaseImageEmbeddings(cfg)
        self.layer = [
            TextLayer(cfg, name=f"layer_{i}") for i in range(cfg.num_hidden_layers)
        ]
        self.pooler_dense = _dense(cfg, cfg.hidden_size, "pooler_dense")

    def word_embedding_table(self):
        return self.embeddings.word_embeddings.embedding

    def __call__(
        self,
        input_txt,
        input_imgs,
        image_loc,
        token_type_ids=None,
        attention_mask=None,
        image_attention_mask=None,
        *,
        deterministic=True,
    ) -> BaseBertModelOutput:
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_txt)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_txt)
        if image_attention_mask is None:
            image_attention_mask = jnp.ones(input_imgs.shape[:2], input_txt.dtype)

        image_token_types = jnp.ones(input_imgs.shape[:2], jnp.int32)
        emb_t = self.embeddings(
            input_txt, token_type_ids, deterministic=deterministic
        )
        emb_v = self.image_embeddings(
            input_imgs, image_loc, image_token_types, deterministic=deterministic
        )
        seq = jnp.concatenate([emb_t, emb_v], axis=1)
        full_mask = jnp.concatenate([attention_mask, image_attention_mask], axis=1)
        bias = make_additive_mask(full_mask)
        for layer in self.layer:
            seq = layer(seq, bias, deterministic=deterministic)
        pooled = jnp.tanh(self.pooler_dense(seq[:, 0]))
        return BaseBertModelOutput(sequence=seq, pooled=pooled)


class BasePretrainOutput(NamedTuple):
    prediction_scores_t: jax.Array
    prediction_scores_v: jax.Array
    seq_relationship_score: jax.Array


class BaseBertForPretraining(nn.Module):
    """Single-stream pretraining (basebert.py:777-891)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.bert = BaseBertModel(cfg)
        self.predictions = LMPredictionHead(cfg)
        self.seq_relationship = _dense(cfg, 2, "seq_relationship")
        self.image_transform = PredictionHeadTransform(
            cfg, cfg.hidden_size, name="image_transform"
        )
        self.image_decoder = _dense(cfg, cfg.v_target_size, "image_decoder")

    def __call__(
        self,
        input_ids,
        image_feat,
        image_loc,
        token_type_ids=None,
        attention_mask=None,
        image_attention_mask=None,
        *,
        lm_positions=None,
        img_positions=None,
        deterministic=True,
    ) -> BasePretrainOutput:
        out = self.bert(
            input_ids, image_feat, image_loc, token_type_ids, attention_mask,
            image_attention_mask, deterministic=deterministic,
        )
        t_len = input_ids.shape[1]
        seq_t, seq_v = out.sequence[:, :t_len], out.sequence[:, t_len:]
        if lm_positions is not None:
            # masked-position LM head (see ViLBERTForPretraining — same
            # loss, ~2/3 fewer vocab-projection FLOPs)
            seq_t = jnp.take_along_axis(seq_t, lm_positions[:, :, None], axis=1)
        if img_positions is not None:
            # masked-region image head (see ViLBERTForPretraining)
            seq_v = jnp.take_along_axis(seq_v, img_positions[:, :, None], axis=1)
        scores_t = self.predictions(seq_t, self.bert.word_embedding_table())
        scores_v = self.image_decoder(self.image_transform(seq_v)).astype(jnp.float32)
        seq_rel = self.seq_relationship(out.pooled).astype(jnp.float32)
        return BasePretrainOutput(scores_t, scores_v, seq_rel)


class BaseVLTaskOutput(NamedTuple):
    vil_prediction: jax.Array = None
    vil_logit: jax.Array = None
    vil_binary_prediction: jax.Array = None
    vision_prediction: jax.Array = None
    vision_logit: jax.Array = None
    linguisic_prediction: jax.Array = None
    linguisic_logit: jax.Array = None


class BaseBertForVLTasks(nn.Module):
    """Single-stream task model returning the reference's 7-tuple
    (basebert.py:893-962)."""

    config: ModelConfig
    num_labels: int = 3129
    dropout_prob: float = 0.1

    def setup(self):
        cfg = self.config
        self.bert = BaseBertModel(cfg)
        self.dropout = nn.Dropout(self.dropout_prob)
        self.predictions = LMPredictionHead(cfg)
        self.seq_relationship = _dense(cfg, 2, "seq_relationship")
        self.image_transform = PredictionHeadTransform(
            cfg, cfg.hidden_size, name="image_transform"
        )
        self.image_decoder = _dense(cfg, cfg.v_target_size, "image_decoder")
        self.vil_prediction_1 = _dense(cfg, cfg.hidden_size * 2, "vil_prediction_1")
        self.vil_prediction_2 = _dense(cfg, self.num_labels, "vil_prediction_2")
        self.vil_logit_dense = _dense(cfg, 1, "vil_logit_dense")
        self.vision_logit_dense = _dense(cfg, 1, "vision_logit_dense")
        self.linguisic_logit_dense = _dense(cfg, 1, "linguisic_logit_dense")

    def __call__(
        self,
        input_txt,
        input_imgs,
        image_loc,
        token_type_ids=None,
        attention_mask=None,
        image_attention_mask=None,
        co_attention_mask=None,  # accepted for API parity; single stream has none
        task_ids=None,
        *,
        heads=None,  # None = all 7 (reference always computes all,
                     # basebert.py:946-961); a tuple compiles only those
        deterministic=True,
    ) -> BaseVLTaskOutput:
        if image_attention_mask is None:
            image_attention_mask = jnp.ones(input_imgs.shape[:2], input_txt.dtype)
        out = self.bert(
            input_txt, input_imgs, image_loc, token_type_ids, attention_mask,
            image_attention_mask, deterministic=deterministic,
        )
        t_len = input_txt.shape[1]
        seq_t, seq_v = out.sequence[:, :t_len], out.sequence[:, t_len:]
        want = (lambda h: heads is None or h in heads)
        results = {}
        if want("linguisic_prediction"):
            results["linguisic_prediction"] = self.predictions(
                seq_t, self.bert.word_embedding_table()
            )
        if want("vision_prediction"):
            results["vision_prediction"] = self.image_decoder(
                self.image_transform(seq_v)
            ).astype(jnp.float32)
        if want("vil_binary_prediction"):
            results["vil_binary_prediction"] = self.seq_relationship(
                out.pooled
            ).astype(jnp.float32)
        if want("vil_prediction"):
            h = jax.nn.relu(self.vil_prediction_1(out.pooled))
            h = self.dropout(h, deterministic=deterministic)
            results["vil_prediction"] = self.vil_prediction_2(h).astype(
                jnp.float32
            )
        if want("vil_logit"):
            results["vil_logit"] = self.vil_logit_dense(out.pooled).astype(
                jnp.float32
            )
        if want("vision_logit"):
            pad = ((1.0 - image_attention_mask.astype(jnp.float32)) * -10000.0)[
                :, :, None
            ]
            results["vision_logit"] = (
                self.vision_logit_dense(
                    self.dropout(seq_v, deterministic=deterministic)
                ).astype(jnp.float32)
                + pad
            )
        if want("linguisic_logit"):
            results["linguisic_logit"] = self.linguisic_logit_dense(
                self.dropout(seq_t, deterministic=deterministic)
            ).astype(jnp.float32)
        return BaseVLTaskOutput(**results)
