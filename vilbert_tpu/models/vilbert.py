"""The two-stream ViLBERT model family, TPU-first.

Re-design of the reference model layer (vilbert/vilbert.py, 1,738 LoC):
- the encoder's interleave of text / image / co-attention layers is a *static
  schedule* computed from the config (``ModelConfig.encoder_schedule``) and
  unrolled at trace time — XLA sees one flat graph, no Python-in-jit control
  flow (reference walks ModuleLists imperatively, vilbert.py:934-1096),
- masks are built once as additive fp32 biases and broadcast,
- all matmuls run in the configured compute dtype (bf16 by default) with fp32
  softmax/LN statistics; params stay fp32,
- heads are computed selectively per task (static ``heads=`` argument) so each
  task's jitted step only pays for its own head — the reference always
  computes all 7 heads (vilbert.py:1684-1695).

Parity quirks preserved (SURVEY.md §7 "hard parts"):
- task-token splice into the already position-embedded sequence
  (vilbert.py:358-362),
- −10000 additive masks (:1341-1362) and vision_logit pad masking
  (:1692-1694),
- erf-gelu, LN eps 1e-12, tied LM decoder (:1178-1196),
- the co-attention mask input is accepted and (exactly like the reference,
  where its use is commented out) has no effect on attention.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vilbert_tpu.core.config import ModelConfig
from vilbert_tpu.models.coattention import ConnectionLayer
from vilbert_tpu.models.layers import (
    ACT2FN,
    resolve_act,
    ImageLayer,
    LayerNorm,
    TextLayer,
    _dense,
    _dropout,
    _ln,
    gelu,
)
from vilbert_tpu.ops.attention import make_additive_mask


class TextEmbeddings(nn.Module):
    """Word + position + type embeddings, optional task token (reference
    BertEmbeddings vilbert.py:320-367, RobertaEmbeddings :370-393)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        pdtype = jnp.dtype(cfg.param_dtype)
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=init, param_dtype=pdtype
        )
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=init, param_dtype=pdtype,
        )
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size,
            embedding_init=init, param_dtype=pdtype,
        )
        if cfg.task_specific_tokens:
            self.task_embeddings = nn.Embed(
                cfg.num_task_tokens, cfg.hidden_size,
                embedding_init=init, param_dtype=pdtype,
            )
        self.LayerNorm = LayerNorm(param_dtype=pdtype)
        self.dropout = _dropout(cfg, cfg.hidden_dropout_prob)

    def __call__(
        self,
        input_ids: jax.Array,              # [B, T] int32
        token_type_ids: jax.Array,         # [B, T] int32
        task_ids: Optional[jax.Array] = None,  # [B, 1] int32
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        seq_len = input_ids.shape[1]
        # RoBERTa quirk: the reference's RobertaEmbeddings computes
        # fairseq-style offset-2 positions (vilbert.py:370-394) but its
        # BertEmbeddings base UNCONDITIONALLY recomputes position_ids from
        # arange(seq_length), ignoring the argument (vilbert.py:347-352) —
        # the offset is dead code and the shipped behavior is offset 0 for
        # both model types. Matching that keeps roberta checkpoints
        # import-compatible (pinned by
        # tests/test_config_matrix.py::test_roberta_checkpoint_import_parity).
        position_ids = jnp.arange(seq_len, dtype=jnp.int32)
        emb = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)[None, :, :]
            + self.token_type_embeddings(token_type_ids)
        )
        if cfg.task_specific_tokens:
            assert task_ids is not None, "task_ids required with task_specific_tokens"
            task_emb = self.task_embeddings(task_ids)  # [B, 1, H]
            # Spliced after [CLS]; positions are those of the original layout
            # (the reference computes position embeddings before the splice).
            emb = jnp.concatenate([emb[:, 0:1], task_emb, emb[:, 1:]], axis=1)
        emb = self.LayerNorm(emb)
        emb = self.dropout(emb, deterministic=deterministic)
        return emb.astype(jnp.dtype(cfg.compute_dtype))


class ImageEmbeddings(nn.Module):
    """Region feature + box-geometry embeddings (reference BertImageEmbeddings
    vilbert.py:1409-1432)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.image_embeddings = _dense(cfg, cfg.v_hidden_size, "image_embeddings")
        self.image_location_embeddings = _dense(
            cfg, cfg.v_hidden_size, "image_location_embeddings"
        )
        self.LayerNorm = LayerNorm(param_dtype=jnp.dtype(cfg.param_dtype))
        self.dropout = _dropout(cfg, cfg.hidden_dropout_prob)

    def __call__(
        self, features: jax.Array, locations: jax.Array, *, deterministic=True
    ) -> jax.Array:
        emb = self.image_embeddings(features) + self.image_location_embeddings(
            locations
        )
        emb = self.LayerNorm(emb)
        emb = self.dropout(emb, deterministic=deterministic)
        return emb.astype(jnp.dtype(self.config.compute_dtype))


class TwoStreamEncoder(nn.Module):
    """Interleaved text/image/co-attention encoder (reference BertEncoder
    vilbert.py:903-1107), driven by a static schedule."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        text_cls, image_cls, conn_cls = TextLayer, ImageLayer, ConnectionLayer
        if cfg.remat:
            # deterministic (the trailing arg) must be static under remat:
            # it drives Python-level dropout branches
            text_cls = nn.remat(TextLayer, static_argnums=(3,))
            image_cls = nn.remat(ImageLayer, static_argnums=(5,))
            conn_cls = nn.remat(ConnectionLayer, static_argnums=(5,))
        self.layer = [
            text_cls(cfg, name=f"layer_{i}") for i in range(cfg.num_hidden_layers)
        ]
        self.v_layer = [
            image_cls(cfg, name=f"v_layer_{i}")
            for i in range(cfg.v_num_hidden_layers)
        ]
        self.c_layer = [
            conn_cls(cfg, name=f"c_layer_{i}")
            for i in range(cfg.num_connection_layers)
        ]

    def __call__(
        self,
        txt_embedding: jax.Array,     # [Bt, T, H]
        image_embedding: jax.Array,   # [Bv, R, Hv]
        bias_t: jax.Array,            # [Bt, 1, 1, T]
        txt_mask2: jax.Array,         # [Bt, T, 1] raw (dynamic attention pooling)
        bias_v: jax.Array,            # [Bv, 1, 1, R]
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        expanded = False

        def maybe_expand():
            """in_batch_pairs B² expansion / FAST_MODE broadcast, applied once
            just before the first connection layer (vilbert.py:1008-1053)."""
            nonlocal txt_embedding, image_embedding, bias_t, bias_v, txt_mask2, expanded
            if expanded:
                return
            expanded = True
            if cfg.in_batch_pairs:
                b = txt_embedding.shape[0]
                # row index = text sample, col index = image sample
                image_embedding = jnp.tile(image_embedding, (b, 1, 1))
                bias_v = jnp.tile(bias_v, (b, 1, 1, 1))
                txt_embedding = jnp.repeat(txt_embedding, b, axis=0)
                bias_t = jnp.repeat(bias_t, b, axis=0)
                txt_mask2 = jnp.repeat(txt_mask2, b, axis=0)
            if cfg.fast_mode:
                bv = image_embedding.shape[0]
                txt_embedding = jnp.broadcast_to(
                    txt_embedding, (bv,) + txt_embedding.shape[1:]
                )
                bias_t = jnp.broadcast_to(bias_t, (bv,) + bias_t.shape[1:])
                txt_mask2 = jnp.broadcast_to(txt_mask2, (bv,) + txt_mask2.shape[1:])

        for kind, idx in cfg.encoder_schedule():
            if kind == "t":
                txt_embedding = self.layer[idx](
                    txt_embedding, bias_t, deterministic
                )
                if idx < cfg.fixed_t_layer:
                    txt_embedding = jax.lax.stop_gradient(txt_embedding)
            elif kind == "v":
                image_embedding = self.v_layer[idx](
                    image_embedding, bias_v, txt_embedding, txt_mask2,
                    deterministic,
                )
                if idx < cfg.fixed_v_layer:
                    image_embedding = jax.lax.stop_gradient(image_embedding)
            else:  # "c"
                maybe_expand()
                image_embedding, txt_embedding = self.c_layer[idx](
                    image_embedding, bias_v, txt_embedding, bias_t,
                    deterministic,
                )
        return txt_embedding, image_embedding


class Pooler(nn.Module):
    """First-token pooling: dense -> ReLU (reference BertTextPooler /
    BertImagePooler, vilbert.py:1110-1137)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        first = hidden_states[:, 0]
        return jax.nn.relu(_dense(self.config, self.config.bi_hidden_size, "dense")(first))


class BertModelOutput(NamedTuple):
    sequence_t: jax.Array
    sequence_v: jax.Array
    pooled_t: jax.Array
    pooled_v: jax.Array


class BertModel(nn.Module):
    """Full two-stream encoder (reference BertModel, vilbert.py:1288-1406)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.embeddings = TextEmbeddings(cfg)
        self.v_embeddings = ImageEmbeddings(cfg)
        self.encoder = TwoStreamEncoder(cfg)
        self.t_pooler = Pooler(cfg)
        self.v_pooler = Pooler(cfg)

    def word_embedding_table(self) -> jax.Array:
        return self.embeddings.word_embeddings.embedding

    def __call__(
        self,
        input_txt: jax.Array,                  # [B, T] int32 token ids
        input_imgs: jax.Array,                 # [B, R, v_feature_size]
        image_loc: jax.Array,                  # [B, R, num_locs]
        token_type_ids: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,    # [B, T] {0,1}
        image_attention_mask: Optional[jax.Array] = None,  # [B, R] {0,1}
        co_attention_mask: Optional[jax.Array] = None,     # accepted, inert
        task_ids: Optional[jax.Array] = None,  # [B, 1] int32
        *,
        deterministic: bool = True,
    ) -> BertModelOutput:
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_txt)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_txt)
        if image_attention_mask is None:
            image_attention_mask = jnp.ones(input_imgs.shape[:2], dtype=input_txt.dtype)

        if cfg.task_specific_tokens:
            # one extra always-valid key position for the task token
            ones = jnp.ones((attention_mask.shape[0], 1), attention_mask.dtype)
            attention_mask = jnp.concatenate([ones, attention_mask], axis=1)

        bias_t = make_additive_mask(attention_mask)
        bias_v = make_additive_mask(image_attention_mask)
        txt_mask2 = attention_mask.astype(jnp.float32)[:, :, None]

        emb_t = self.embeddings(
            input_txt, token_type_ids, task_ids, deterministic=deterministic
        )
        emb_v = self.v_embeddings(input_imgs, image_loc, deterministic=deterministic)
        seq_t, seq_v = self.encoder(
            emb_t, emb_v, bias_t, txt_mask2, bias_v, deterministic=deterministic
        )
        return BertModelOutput(
            sequence_t=seq_t,
            sequence_v=seq_v,
            pooled_t=self.t_pooler(seq_t),
            pooled_v=self.v_pooler(seq_v),
        )


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


class PredictionHeadTransform(nn.Module):
    """dense -> act -> LN (reference BertPredictionHeadTransform)."""

    config: ModelConfig
    hidden_size: int

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        cfg = self.config
        h = _dense(cfg, self.hidden_size, "dense")(h)
        h = resolve_act(cfg.hidden_act, cfg)(h)
        return _ln(cfg)(h)


class LMPredictionHead(nn.Module):
    """Transform + tied decoder + bias (reference BertLMPredictionHead,
    vilbert.py:1178-1196). The decoder weight is the word-embedding table,
    passed in at call time."""

    config: ModelConfig

    @nn.compact
    def __call__(self, h: jax.Array, embedding_table: jax.Array) -> jax.Array:
        cfg = self.config
        h = PredictionHeadTransform(cfg, cfg.hidden_size, name="transform")(h)
        bias = self.param(
            "bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.dtype(cfg.param_dtype)
        )
        # accumulate on the MXU in fp32, but store the [B,T,vocab] scores in
        # the compute dtype — this tensor is ~1.1GB/step in fp32 at CC shapes
        # and dominates head-side HBM traffic; the loss upcasts to fp32
        out_dtype = jnp.dtype(cfg.compute_dtype)
        logits = jnp.einsum(
            "bth,vh->btv",
            h,
            embedding_table.astype(h.dtype),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        return logits + bias.astype(out_dtype)


class ImagePredictionHead(nn.Module):
    """Transform + decoder to v_target_size soft-class distribution
    (reference BertImagePredictionHead, vilbert.py:1246-1258)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        cfg = self.config
        h = PredictionHeadTransform(cfg, cfg.v_hidden_size, name="transform")(h)
        return _dense(cfg, cfg.v_target_size, "decoder")(h)


class PreTrainingHeads(nn.Module):
    """MLM + alignment + masked-region heads (reference BertPreTrainingHeads,
    vilbert.py:1219-1243). Fusion of pooled outputs is sum or mul."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.predictions = LMPredictionHead(cfg)
        self.bi_seq_relationship = _dense(cfg, 2, "bi_seq_relationship")
        self.imagePredictions = ImagePredictionHead(cfg)
        self.dropout = _dropout(cfg, 0.1)

    def fuse(self, pooled_t, pooled_v, *, deterministic=True):
        if self.config.fusion_method == "sum":
            fused = pooled_t + pooled_v
        else:
            fused = pooled_t * pooled_v
        return self.dropout(fused, deterministic=deterministic)

    def __call__(
        self,
        sequence_t: jax.Array,
        sequence_v: jax.Array,
        pooled_t: jax.Array,
        pooled_v: jax.Array,
        embedding_table: jax.Array,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        pooled = self.fuse(pooled_t, pooled_v, deterministic=deterministic)
        scores_t = self.predictions(sequence_t, embedding_table)
        scores_v = self.imagePredictions(sequence_v)
        seq_relationship = self.bi_seq_relationship(pooled).astype(jnp.float32)
        return scores_t, scores_v, seq_relationship


class SimpleClassifier(nn.Module):
    """Linear -> GeLU -> LN -> Linear (reference SimpleClassifier,
    vilbert.py:1711-1722)."""

    config: ModelConfig
    hid_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = _dense(cfg, self.hid_dim, "dense1")(x)
        h = gelu(h)
        h = _ln(cfg)(h)
        return _dense(cfg, self.out_dim, "dense2")(h).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Top-level models
# ---------------------------------------------------------------------------


class PretrainOutput(NamedTuple):
    prediction_scores_t: jax.Array   # [B, T, vocab]
    prediction_scores_v: jax.Array   # [B, R, v_target_size]
    seq_relationship_score: jax.Array  # [B, 2]
    pooled_t: jax.Array
    pooled_v: jax.Array


class ViLBERTForPretraining(nn.Module):
    """Masked multimodal pretraining model (reference
    BertForMultiModalPreTraining, vilbert.py:1435-1597). Returns logits;
    the three losses live in vilbert_tpu.train.losses.pretrain_losses."""

    config: ModelConfig

    def setup(self):
        self.bert = BertModel(self.config)
        self.cls = PreTrainingHeads(self.config)

    def __call__(
        self,
        input_ids: jax.Array,
        image_feat: jax.Array,
        image_loc: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        image_attention_mask: Optional[jax.Array] = None,
        *,
        lm_positions: Optional[jax.Array] = None,
        img_positions: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> PretrainOutput:
        out = self.bert(
            input_ids,
            image_feat,
            image_loc,
            token_type_ids,
            attention_mask,
            image_attention_mask,
            deterministic=deterministic,
        )
        sequence_t = out.sequence_t
        if lm_positions is not None:
            # Project only the masked positions through the [H, vocab] LM
            # head: with 15% masking the full-sequence projection spends
            # ~2/3 of its FLOPs and HBM traffic (a [B,T,30522] tensor) on
            # positions whose loss is ignored. prediction_scores_t is then
            # [B, K, vocab], aligned with lm_positions. The reference always
            # projects every position (vilbert.py:1578-1581) — same loss,
            # less arithmetic.
            sequence_t = jnp.take_along_axis(
                sequence_t, lm_positions[:, :, None], axis=1
            )
        sequence_v = out.sequence_v
        if img_positions is not None:
            # Same trick for the image head: only the ~15% masked regions
            # contribute to the masked-region loss, so project just those
            # rows through the v_hidden transform + [v_hidden, 1601]
            # decoder. prediction_scores_v is then [B, K, v_target_size],
            # aligned with img_positions (row indices into sequence_v, i.e.
            # already offset past the global row the reference slices off at
            # vilbert.py:1506).
            sequence_v = jnp.take_along_axis(
                sequence_v, img_positions[:, :, None], axis=1
            )
        scores_t, scores_v, seq_rel = self.cls(
            sequence_t,
            sequence_v,
            out.pooled_t,
            out.pooled_v,
            self.bert.word_embedding_table(),
            deterministic=deterministic,
        )
        return PretrainOutput(
            prediction_scores_t=scores_t,
            prediction_scores_v=scores_v,
            seq_relationship_score=seq_rel,
            pooled_t=out.pooled_t,
            pooled_v=out.pooled_v,
        )


#: All head names of the VL-tasks model, reference 10-tuple order
#: (vilbert.py:1697-1708).
ALL_HEADS = (
    "vil_prediction",
    "vil_prediction_gqa",
    "vil_logit",
    "vil_binary_prediction",
    "vil_tri_prediction",
    "vision_prediction",
    "vision_logit",
    "linguisic_prediction",
    "linguisic_logit",
)


class VLTaskOutput(NamedTuple):
    vil_prediction: Any = None
    vil_prediction_gqa: Any = None
    vil_logit: Any = None
    vil_binary_prediction: Any = None
    vil_tri_prediction: Any = None
    vision_prediction: Any = None
    vision_logit: Any = None
    linguisic_prediction: Any = None
    linguisic_logit: Any = None


class ViLBERTForVLTasks(nn.Module):
    """Fine-tuning model with the 7 task heads (reference VILBertForVLTasks,
    vilbert.py:1600-1708).

    Unlike the reference — which always computes every head — the set of
    heads to compute is a static argument, so each task's compiled step only
    contains its own head. ``heads=None`` computes all (parity/demo mode).
    """

    config: ModelConfig
    num_labels: int = 3129
    num_labels_gqa: int = 1533
    dropout_prob: float = 0.1

    def setup(self):
        cfg = self.config
        self.bert = BertModel(cfg)
        self.cls = PreTrainingHeads(cfg)
        self.dropout = _dropout(cfg, self.dropout_prob)
        bi = cfg.bi_hidden_size
        self.vil_prediction = SimpleClassifier(cfg, bi * 2, self.num_labels)
        self.vil_prediction_gqa = SimpleClassifier(cfg, bi * 2, self.num_labels_gqa)
        self.vil_binary_prediction = SimpleClassifier(cfg, bi * 2, 2)
        self.vil_logit = _dense(cfg, 1, "vil_logit_dense")
        self.vil_tri_prediction = _dense(cfg, 3, "vil_tri_dense")
        self.vision_logit_dense = _dense(cfg, 1, "vision_logit_dense")
        self.linguisic_logit_dense = _dense(cfg, 1, "linguisic_logit_dense")

    def __call__(
        self,
        input_txt: jax.Array,
        input_imgs: jax.Array,
        image_loc: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        image_attention_mask: Optional[jax.Array] = None,
        co_attention_mask: Optional[jax.Array] = None,
        task_ids: Optional[jax.Array] = None,
        *,
        heads: Optional[Sequence[str]] = None,
        deterministic: bool = True,
    ) -> VLTaskOutput:
        cfg = self.config
        if heads is None:
            heads = ALL_HEADS
        heads = tuple(heads)

        out = self.bert(
            input_txt,
            input_imgs,
            image_loc,
            token_type_ids,
            attention_mask,
            image_attention_mask,
            co_attention_mask,
            task_ids,
            deterministic=deterministic,
        )
        results: Dict[str, Any] = {}

        if {"vision_prediction", "linguisic_prediction", "vil_binary_prediction"} & set(
            heads
        ):
            # the reference routes these three through the pretraining heads
            # (vilbert.py:1673-1675); vil_binary_prediction from cls is then
            # overwritten by the SimpleClassifier below when batch is even —
            # we expose the classifier version under the same name.
            scores_t, scores_v, seq_rel = self.cls(
                out.sequence_t,
                out.sequence_v,
                out.pooled_t,
                out.pooled_v,
                self.bert.word_embedding_table(),
                deterministic=deterministic,
            )
            results["linguisic_prediction"] = scores_t
            results["vision_prediction"] = scores_v

        pooled = self.cls.fuse(
            out.pooled_t, out.pooled_v, deterministic=deterministic
        )
        pooled = pooled.astype(jnp.dtype(cfg.compute_dtype))

        if "vil_prediction" in heads:
            results["vil_prediction"] = self.vil_prediction(pooled)
        if "vil_prediction_gqa" in heads:
            results["vil_prediction_gqa"] = self.vil_prediction_gqa(pooled)
        if "vil_binary_prediction" in heads:
            b, h = pooled.shape
            if b % 2 == 0:
                # pairs (e.g. NLVR2's two images) arrive as consecutive rows;
                # concatenate each pair's pooled vectors (vilbert.py:1686-1689)
                results["vil_binary_prediction"] = self.vil_binary_prediction(
                    pooled.reshape(b // 2, h * 2)
                )
            elif self.is_initializing():
                # odd batch at init time: still touch the head so its params
                # exist (the reference creates all heads unconditionally)
                self.vil_binary_prediction(
                    jnp.concatenate([pooled, pooled], axis=-1)
                )
            # odd batches at apply time skip the head like the reference
        if "vil_logit" in heads:
            results["vil_logit"] = self.vil_logit(pooled).astype(jnp.float32)
        if "vil_tri_prediction" in heads:
            results["vil_tri_prediction"] = self.vil_tri_prediction(pooled).astype(
                jnp.float32
            )
        if "vision_logit" in heads:
            if image_attention_mask is None:
                image_attention_mask = jnp.ones(
                    input_imgs.shape[:2], dtype=input_txt.dtype
                )
            seq_v = self.dropout(out.sequence_v, deterministic=deterministic)
            logit = self.vision_logit_dense(seq_v).astype(jnp.float32)
            pad = ((1.0 - image_attention_mask.astype(jnp.float32)) * -10000.0)[
                :, :, None
            ]
            results["vision_logit"] = logit + pad
        if "linguisic_logit" in heads:
            seq_t = self.dropout(out.sequence_t, deterministic=deterministic)
            results["linguisic_logit"] = self.linguisic_logit_dense(seq_t).astype(
                jnp.float32
            )

        return VLTaskOutput(**results)
