"""Loss functions for pretraining and the per-task head types.

Pretraining losses mirror reference BertForMultiModalPreTraining.forward
(vilbert/vilbert.py:1501-1590): masked LM cross-entropy with ignore_index=-1,
masked-region loss in three modes (KL vs soft detector distribution / MSE
feature regression / NCE with mixed across-/in-batch negatives), and the
NSP-style alignment cross-entropy.

Task losses mirror LossMap + the per-type branches of ForwardModelsTrain
(vilbert/task_utils.py:25-28, :325-374).

All losses reduce in fp32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def _nll(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """-log p(label) via logsumexp + gather — never materializes a
    full-vocab fp32 log-probability tensor (the [B,T,30522] fp32
    intermediate showed up as ~5ms/step in the TPU op profile)."""
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    gathered = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return lse - gathered.astype(jnp.float32)


def cross_entropy_ignore_index(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -1
) -> jax.Array:
    """Mean CE over positions whose label != ignore_index (torch semantics)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    nll = jnp.where(valid, _nll(logits, safe_labels), 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE with integer labels (no ignore index)."""
    return jnp.mean(_nll(logits, labels))


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary CE with logits, mean reduction (torch
    BCEWithLogitsLoss(reduction="mean"))."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(loss)


def kl_div_soft_targets(
    log_pred: jax.Array, target: jax.Array
) -> jax.Array:
    """torch KLDivLoss(reduction="none"): target * (log(target) - log_pred).

    Zero-target entries contribute 0 (torch convention: 0*log(0)=0).
    """
    target = target.astype(jnp.float32)
    safe_log_t = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-30)), 0.0)
    return jnp.where(target > 0, target * (safe_log_t - log_pred), 0.0)


class PretrainLosses(NamedTuple):
    masked_lm_loss: jax.Array
    masked_img_loss: jax.Array
    next_sentence_loss: jax.Array


def masked_image_loss(
    prediction_scores_v: jax.Array,  # [B, R, v_target_size] (incl. global row 0)
    image_label: jax.Array,          # [B, R-?]: 1 = masked region, -1 = pad/unmasked
    image_target: jax.Array,         # [B, R-1, v_target_size] or [B, R-1, feat]
    *,
    visual_target: int,
    num_negative: int = 128,
    rng: Optional[jax.Array] = None,
    gathered: bool = False,
) -> jax.Array:
    """Masked-region loss. Row 0 (the global mean feature) is skipped
    (vilbert.py:1506 ``prediction_scores_v[:, 1:]``).

    ``gathered=True``: the model already projected only K selected region
    rows (``img_positions``), so ``prediction_scores_v`` is [B, K, ...] with
    the global row excluded at gather time, and ``image_label`` /
    ``image_target`` arrive gathered to the same K rows — no slice here.
    NCE (visual_target=2) samples negatives across all regions and is not
    supported gathered."""
    if gathered:
        assert visual_target != 2, "img_gather is not supported with NCE"
        pred = prediction_scores_v.astype(jnp.float32)
    else:
        pred = prediction_scores_v[:, 1:].astype(jnp.float32)
    assert image_label.shape[1] == pred.shape[1], (
        "image_label rows must align with prediction rows "
        "([B, K] gathered, or [B, R-1] with the global mean row excluded)"
    )
    masked = (image_label == 1).astype(jnp.float32)  # [B, R-1]

    if visual_target == 1:
        # MSE feature regression, averaged over masked *elements*
        # (vilbert.py:1507-1513: denominator counts masked rows × feat dim)
        err = jnp.square(pred - image_target.astype(jnp.float32))
        num = jnp.sum(err * masked[..., None])
        den = jnp.maximum(jnp.sum(masked) * pred.shape[-1], 1.0)
        return num / den
    if visual_target == 0:
        # KL divergence vs the detector's soft class distribution, averaged
        # over masked rows (vilbert.py:1515-1522)
        logp = jax.nn.log_softmax(pred, axis=-1)
        kl = kl_div_soft_targets(logp, image_target)
        num = jnp.sum(kl * masked[..., None])
        den = jnp.maximum(jnp.sum(masked), 1.0)
        return num / den
    if visual_target == 2:
        # NCE: score the predicted feature against the true region feature
        # plus `num_negative` sampled negatives, 70% across-batch / 30%
        # in-batch (vilbert.py:1523-1575). The reference gathers only masked
        # rows (dynamic shape); we compute all rows and mask the mean —
        # identical expectation, static shapes for XLA.
        assert rng is not None, "visual_target=2 requires an rng"
        # targets may arrive fp16 (compress_for_transfer); score in the
        # prediction dtype — TPU matmuls want bf16/fp32, not fp16
        image_target = image_target.astype(pred.dtype)
        b, r, d = image_target.shape
        n_across = int(num_negative * 0.7)
        n_inside = int(num_negative * 0.3)
        k_row, k_col, k_col2 = jax.random.split(rng, 3)
        # across-batch: random (row != self, col) pairs
        row_idx = jax.random.randint(k_row, (b, r, n_across), 0, b - 1)
        row_ids = jnp.arange(b)[:, None, None]
        row_idx = jnp.where(row_idx == row_ids, b - 1, row_idx)
        col_idx = jax.random.randint(k_col, (b, r, n_across), 0, r)
        across = row_idx * r + col_idx
        # in-batch: same row, col != self
        col_in = jax.random.randint(k_col2, (b, r, n_inside), 0, r - 1)
        col_ids = jnp.arange(r)[None, :, None]
        col_in = jnp.where(col_in == col_ids, r - 1, col_in)
        inside = row_ids * r + col_in
        neg_index = jnp.concatenate([across, inside], axis=2)  # [B,R,N]

        flat_t = image_target.reshape(b * r, d)
        negatives = flat_t[neg_index.reshape(-1)].reshape(b, r, -1, d)
        samples = jnp.concatenate(
            [image_target[:, :, None, :], negatives], axis=2
        )  # [B,R,1+N,d]
        score = jnp.einsum(
            "brnd,brd->brn", samples, pred, preferred_element_type=jnp.float32
        )
        logp = jax.nn.log_softmax(score, axis=-1)
        nll = -logp[..., 0]
        num = jnp.sum(nll * masked)
        den = jnp.maximum(jnp.sum(masked), 1.0)
        return num / den
    raise ValueError(f"unknown visual_target {visual_target}")


def pretrain_losses(
    out,
    masked_lm_labels: jax.Array,
    image_label: jax.Array,
    image_target: jax.Array,
    next_sentence_label: jax.Array,
    *,
    visual_target: int,
    num_negative: int = 128,
    rng: Optional[jax.Array] = None,
    img_gathered: bool = False,
) -> PretrainLosses:
    return PretrainLosses(
        masked_lm_loss=cross_entropy_ignore_index(
            out.prediction_scores_t, masked_lm_labels, -1
        ),
        masked_img_loss=masked_image_loss(
            out.prediction_scores_v,
            image_label,
            image_target,
            visual_target=visual_target,
            num_negative=num_negative,
            rng=rng,
            gathered=img_gathered,
        ),
        next_sentence_loss=cross_entropy_ignore_index(
            out.seq_relationship_score, next_sentence_label, -1
        ),
    )


# ---------------------------------------------------------------------------
# Per-task losses and scores (reference task_utils.py:325-374, :618-623)
# ---------------------------------------------------------------------------


def compute_score_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Sum of soft-target mass at the argmax prediction (task_utils.py:618-623)."""
    pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
    gathered = jnp.take_along_axis(targets, pred[..., None], axis=-1)[..., 0]
    return jnp.sum(gathered)


def task_loss_and_score(
    task_type: str,
    logits: jax.Array,
    target: jax.Array,
    *,
    num_options: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Loss and batch score for one task head type.

    Mirrors the per-type branches of ForwardModelsTrain
    (task_utils.py:325-374). ``logits`` is the relevant head output already
    reshaped to [batch(, options| regions), classes].

    Returns (mean-style loss as the reference computes it, batch score
    normalized by batch where the reference does so).
    """
    if task_type in ("VL-classifier", "VL-classifier-GQA"):
        # BCE over soft labels, times label width (reference multiplies the
        # mean BCE by target.size(1), task_utils.py:327-333)
        loss = bce_with_logits(logits, target) * target.shape[1]
        score = compute_score_with_logits(logits, target) / target.shape[0]
        return loss, score
    if task_type == "VL-logit":
        # option ranking: logits [B, num_options], integer target [B]
        loss = cross_entropy(logits, target)
        pred = jnp.argmax(logits, axis=-1)
        score = jnp.mean((pred == target).astype(jnp.float32))
        return loss, score
    if task_type in ("V-logit", "V-logit-mc"):
        # per-region BCE with a [B, R(, 1)] IoU-derived target
        loss = bce_with_logits(logits, target) * target.shape[1]
        pred = jnp.argmax(logits.squeeze(-1), axis=-1)
        gathered = jnp.take_along_axis(
            (target.squeeze(-1) if target.ndim == 3 else target), pred[:, None], axis=1
        )
        score = jnp.sum((gathered > 0.5).astype(jnp.float32)) / logits.shape[0]
        return loss, score
    if task_type in ("VL-binary-classifier", "VL-tri-classifier"):
        loss = cross_entropy(logits, target)
        pred = jnp.argmax(logits, axis=-1)
        score = jnp.mean((pred == target).astype(jnp.float32))
        return loss, score
    raise ValueError(f"unknown task type {task_type}")


def task_loss_and_score_per_sample(
    task_type: str, logits: jax.Array, target: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Unreduced variant of task_loss_and_score: ([B] loss, [B] score).

    Means of these vectors reproduce the reduced values exactly; eval loops
    use them for sample-weighted metrics over padded fixed-shape batches
    (reference accumulates batch_score * batch_size, eval_tasks.py:276-301).
    """
    logits = logits.astype(jnp.float32)

    def bce_elem(lg, t):
        t = t.astype(jnp.float32)
        return jnp.maximum(lg, 0) - lg * t + jnp.log1p(jnp.exp(-jnp.abs(lg)))

    if task_type in ("VL-classifier", "VL-classifier-GQA"):
        # reduced loss = mean(bce) * C  ⇒ per-sample = mean_C(bce) * C
        loss = bce_elem(logits, target).mean(axis=-1) * target.shape[1]
        score = compute_score_with_logits_per_sample(logits, target)
        return loss, score
    if task_type == "VL-logit":
        loss = _nll(logits, target)
        score = (jnp.argmax(logits, axis=-1) == target).astype(jnp.float32)
        return loss, score
    if task_type in ("V-logit", "V-logit-mc"):
        t = target.squeeze(-1) if target.ndim == 3 else target
        lg = logits.squeeze(-1) if logits.ndim == 3 else logits
        # reduced loss = mean(bce) * R ⇒ per-sample = mean_R(bce) * R
        loss = bce_elem(lg, t).mean(axis=-1) * t.shape[1]
        pred = jnp.argmax(lg, axis=-1)
        gathered = jnp.take_along_axis(t, pred[:, None], axis=1)[:, 0]
        score = (gathered > 0.5).astype(jnp.float32)
        return loss, score
    if task_type in ("VL-binary-classifier", "VL-tri-classifier"):
        loss = _nll(logits, target)
        score = (jnp.argmax(logits, axis=-1) == target).astype(jnp.float32)
        return loss, score
    raise ValueError(f"unknown task type {task_type}")


def compute_score_with_logits_per_sample(
    logits: jax.Array, targets: jax.Array
) -> jax.Array:
    """Per-sample soft-target mass at the argmax (task_utils.py:618-623)."""
    pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(targets, pred[..., None], axis=-1)[..., 0]
