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

#: flax param-path prefixes of the task heads. The reference gives the head
#: LR (1e-4) to exactly the params whose name contains "vil_"
#: (train_tasks.py:403-406) — NOT vision_logit/linguisic_logit/cls, which
#: train at base_lr.
HEAD_PREFIXES = (
    "vil_prediction",
    "vil_prediction_gqa",
    "vil_binary_prediction",
    "vil_logit_dense",
    "vil_tri_dense",
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


#: schedules that compose a per-iteration warmup with an epoch-level scheduler
#: (reference train_tasks.py:440-457); they carry host state and therefore
#: require the external-lr step (multi-task trainer).
EPOCH_SCHEDULES = ("mannul", "automatic", "cosine", "cosine_warm")

#: epochs at whose END the "mannul" scheduler multiplies the LR by 0.2
#: (reference lr_reduce_list = [5, 7]: the ×0.2**k factor applies from the
#: start of epoch 5 resp. 7, train_tasks.py:439,:604-605)
LR_REDUCE_EPOCHS = (5, 7)


class HostLRScheduler:
    """The reference train_tasks.py LR family, evaluated host-side.

    Reproduces the composition of two torch schedulers over one optimizer
    (train_tasks.py:431-457):

    - every iteration, WarmupConstantSchedule ramps 0→base over the warmup
      then holds (it stops stepping after warmup, train_tasks.py:552-556);
    - "mannul": LambdaLR ×0.2**|{5,7} ≤ epoch| stepped at epoch end
      (train_tasks.py:604-605) — the reference DEFAULT;
    - "automatic": ReduceLROnPlateau(mode=max, factor=0.2, patience=1,
      cooldown=1, threshold=0.001) stepped on the summed val scores at epoch
      end (train_tasks.py:595-597);
    - "cosine"/"cosine_warm": CosineAnnealing(T=total_steps) stepped once per
      iteration after warmup (train_tasks.py:571-573), closed form.

    Callable(step) → float LR; ``on_epoch_end(epoch, val_score_sum)`` applies
    the epoch-level transition. State is checkpointable via state_dict().
    """

    def __init__(self, kind: str, base_lr: float, total_steps: int,
                 warmup_proportion: float):
        assert kind in EPOCH_SCHEDULES, kind
        self.kind = kind
        self.base_lr = base_lr
        self.total_steps = max(total_steps, 1)
        self.warmup_steps = max(int(self.total_steps * warmup_proportion), 1)
        self.decay_factor = 1.0
        # ReduceLROnPlateau state (torch defaults: threshold_mode="rel")
        self.plateau_best = -float("inf")
        self.plateau_bad = 0
        self.plateau_cooldown = 0

    def __call__(self, step) -> float:
        import math

        step = float(step)
        warm = min(step / self.warmup_steps, 1.0)
        if self.kind in ("mannul", "automatic"):
            return self.base_lr * warm * self.decay_factor
        # cosine family: the annealer steps once per iteration past warmup
        # with T_max/T_0 = total_steps (train_tasks.py:444-452,:571-573) — so
        # t lags ``step`` by the warmup and the curve never quite reaches 0
        t = max(step - self.warmup_steps, 0.0)
        T = float(self.total_steps)
        if self.kind == "cosine_warm":
            t = t % T
        return self.base_lr * warm * 0.5 * (1.0 + math.cos(math.pi * min(t / T, 1.0)))

    def on_epoch_end(self, epoch: int, val_score_sum: Optional[float] = None):
        if self.kind == "mannul":
            nxt = epoch + 1
            self.decay_factor = 0.2 ** sum(1 for r in LR_REDUCE_EPOCHS if r <= nxt)
        elif self.kind == "automatic" and val_score_sum is not None:
            a = float(val_score_sum)
            if a > self.plateau_best * (1.0 + 0.001):
                self.plateau_best = a
                self.plateau_bad = 0
            else:
                self.plateau_bad += 1
            if self.plateau_cooldown > 0:
                self.plateau_cooldown -= 1
                self.plateau_bad = 0
            if self.plateau_bad > 1:  # patience=1
                self.decay_factor *= 0.2
                self.plateau_cooldown = 1  # cooldown=1
                self.plateau_bad = 0

    def state_dict(self) -> Dict[str, float]:
        return {k: getattr(self, k) for k in
                ("decay_factor", "plateau_best", "plateau_bad",
                 "plateau_cooldown")}

    def load_state_dict(self, d: Mapping[str, float]) -> None:
        for k, v in d.items():
            setattr(self, k, v)


def make_schedule(cfg: OptimizerConfig, base_lr: float, total_steps: int):
    if cfg.schedule == "warmup_linear":
        return warmup_linear_schedule(base_lr, total_steps, cfg.warmup_proportion)
    if cfg.schedule == "warmup_constant":
        return warmup_constant_schedule(base_lr, total_steps, cfg.warmup_proportion)
    if cfg.schedule == "constant":
        return lambda step: base_lr
    if cfg.schedule in EPOCH_SCHEDULES:
        return HostLRScheduler(
            cfg.schedule, base_lr, total_steps, cfg.warmup_proportion
        )
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
    if cfg.schedule in EPOCH_SCHEDULES and not external_lr:
        raise ValueError(
            f"schedule {cfg.schedule!r} carries host state (epoch-level LR "
            "transitions) and requires external_lr=True"
        )
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
