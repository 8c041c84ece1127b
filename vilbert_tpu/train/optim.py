"""Optimizers, LR schedules and parameter grouping.

Replaces the reference's optimizer stack (SURVEY.md §2.5/§2.6):
- apex FusedAdam + FP16_Optimizer + manual fp16 loss scaling
  (train_concap.py:443-470) → optax adamw with fp32 params and bf16 compute
  (no loss scaling needed on TPU),
- pytorch_transformers WarmupLinearSchedule / WarmupConstantSchedule
  (train_tasks.py:26-30) → optax-style schedule functions,
- RAdam (vilbert/optimization.py:16-176) → optax.radam,
- per-parameter-group LR / weight-decay rules (train_tasks.py:379-420:
  task heads at 1e-4, no decay for bias/LayerNorm, --freeze prefix;
  train_concap.py:420-435: pretrained BERT weights at lr×0.1) →
  optax.multi_transform over path-derived labels.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from vilbert_tpu.core.config import OptimizerConfig

#: flax param-path prefixes of the task heads (reference: every param whose
#: name contains "vil_" plus the classifier/logit heads, train_tasks.py:379-398)
HEAD_PREFIXES = (
    "vil_prediction",
    "vil_prediction_gqa",
    "vil_binary_prediction",
    "vil_logit_dense",
    "vil_tri_dense",
    "vision_logit_dense",
    "linguisic_logit_dense",
    "cls",
)

#: no weight decay for biases and LayerNorm params (train_tasks.py:399-411)
NO_DECAY_SUFFIXES = ("bias", "LayerNorm.weight", "LayerNorm1.weight",
                     "LayerNorm2.weight")


def path_str(path: Tuple[Any, ...]) -> str:
    return ".".join(str(getattr(p, "key", p)) for p in path)


def warmup_linear_schedule(
    base_lr: float, total_steps: int, warmup_proportion: float
) -> optax.Schedule:
    """lr ramps 0→base over warmup, then linearly decays to 0 at total_steps
    (pytorch_transformers WarmupLinearSchedule semantics)."""
    warmup = max(int(total_steps * warmup_proportion), 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup
        decay = jnp.maximum(
            (total_steps - step) / jnp.maximum(total_steps - warmup, 1), 0.0
        )
        return base_lr * jnp.where(step < warmup, warm, decay)

    return fn


def warmup_constant_schedule(
    base_lr: float, total_steps: int, warmup_proportion: float
) -> optax.Schedule:
    warmup = max(int(total_steps * warmup_proportion), 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.where(step < warmup, step / warmup, 1.0)

    return fn


def make_schedule(cfg: OptimizerConfig, base_lr: float, total_steps: int):
    if cfg.schedule == "warmup_linear":
        return warmup_linear_schedule(base_lr, total_steps, cfg.warmup_proportion)
    if cfg.schedule == "warmup_constant":
        return warmup_constant_schedule(base_lr, total_steps, cfg.warmup_proportion)
    if cfg.schedule == "constant":
        return lambda step: base_lr
    raise ValueError(cfg.schedule)


def _decay_mask(params) -> Any:
    def mask(path, _):
        p = path_str(path)
        return not any(p.endswith(sfx) for sfx in NO_DECAY_SUFFIXES)

    return jax.tree_util.tree_map_with_path(mask, params)


def _base_transform(cfg: OptimizerConfig, schedule, params) -> optax.GradientTransformation:
    if cfg.name == "adamw":
        return optax.adamw(
            schedule,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask(params),
        )
    if cfg.name == "radam":
        tx = optax.radam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps)
        if cfg.weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask(params)),
                tx,
            )
        return tx
    raise ValueError(cfg.name)


def label_params(
    params,
    *,
    freeze_prefix: str = "",
    head_lr: Optional[float] = None,
    pretrained_lr_scale: float = 1.0,
) -> Any:
    """Label each param "frozen" | "head" | "pretrained_scaled" | "base"."""

    def label(path, _):
        p = path_str(path)
        if freeze_prefix and p.startswith(freeze_prefix):
            return "frozen"
        if head_lr is not None and any(p.startswith(h) for h in HEAD_PREFIXES):
            return "head"
        if pretrained_lr_scale != 1.0 and p.startswith("bert"):
            return "pretrained_scaled"
        return "base"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    cfg: OptimizerConfig,
    params,
    total_steps: int,
    *,
    freeze_prefix: str = "",
    external_lr: bool = False,
) -> Tuple[optax.GradientTransformation, Callable[[int], jax.Array]]:
    """Build the full transformation incl. param groups and clipping.

    Returns (tx, schedule_fn) — schedule_fn is exposed for logging.

    With ``external_lr=True`` the per-group learning rates inside ``tx`` are
    constant RATIOS relative to cfg.learning_rate (base = 1.0); the caller
    multiplies the updates by ``schedule_fn(iteration)`` each step (see
    parallel.train_step.make_train_step(external_lr=True)). adamw/radam are
    linear in lr (weight decay included), so the result is identical math
    with the schedule driven by the host's iteration counter — the exact
    reference multi-task semantics (train_tasks.py:541-559).
    """
    labels = label_params(
        params,
        freeze_prefix=freeze_prefix,
        head_lr=cfg.head_lr,
        pretrained_lr_scale=cfg.pretrained_lr_scale,
    )
    schedule = make_schedule(cfg, cfg.learning_rate, total_steps)

    def group_lr(lr: float):
        if external_lr:
            return lr / cfg.learning_rate  # constant ratio
        return make_schedule(cfg, lr, total_steps)

    transforms: Dict[str, optax.GradientTransformation] = {
        "base": _base_transform(cfg, group_lr(cfg.learning_rate), params)
    }
    label_set = set(jax.tree.leaves(labels))
    if "head" in label_set:
        transforms["head"] = _base_transform(cfg, group_lr(cfg.head_lr), params)
    if "pretrained_scaled" in label_set:
        transforms["pretrained_scaled"] = _base_transform(
            cfg, group_lr(cfg.learning_rate * cfg.pretrained_lr_scale), params
        )
    if "frozen" in label_set:
        transforms["frozen"] = optax.set_to_zero()

    tx = optax.multi_transform(transforms, labels)
    if cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx, schedule
