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

from typing import Any, Callable, Dict, Mapping, NamedTuple, Optional, Sequence, Tuple

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

#: no weight decay for params whose name CONTAINS one of these — the
#: reference's substring check (no_decay = ["bias", "LayerNorm.bias",
#: "LayerNorm.weight"], train_tasks.py:379 / train_concap.py:399, applied
#: via ``any(nd in key)``). NOTE the co-attention BiOutput's LayerNorm1 /
#: LayerNorm2 weights do NOT match "LayerNorm.weight" as a substring, so
#: the reference DOES weight-decay them — reproduced faithfully here.
#: ("LayerNorm.bias" is subsumed by "bias".)
NO_DECAY_SUBSTRINGS = ("bias", "LayerNorm.weight")


def path_str(path: Tuple[Any, ...]) -> str:
    return ".".join(str(getattr(p, "key", p)) for p in path)


def warmup_linear_schedule(
    base_lr: float, total_steps: int, warmup_proportion: float
) -> optax.Schedule:
    """lr ramps 0→base over warmup, then linearly decays to 0 at total_steps.

    Exact pytorch_transformers ``WarmupLinearSchedule`` lambda: the warmup
    threshold is a FLOAT (``warmup_proportion * t_total`` is passed through
    un-rounded, reference train_concap.py:472-476, train_tasks.py:430-436):
    ``step/max(1, w)`` if ``step < w`` else ``max(0, (T-step)/max(1, T-w))``.
    """
    warmup = float(total_steps * warmup_proportion)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(warmup, 1.0)
        decay = jnp.maximum(
            (total_steps - step) / max(total_steps - warmup, 1.0), 0.0
        )
        return base_lr * jnp.where(step < warmup, warm, decay)

    return fn


def warmup_constant_schedule(
    base_lr: float, total_steps: int, warmup_proportion: float
) -> optax.Schedule:
    """pytorch_transformers ``WarmupConstantSchedule``: ramp then hold
    (float warmup threshold, see warmup_linear_schedule)."""
    warmup = float(total_steps * warmup_proportion)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.where(
            step < warmup, step / max(warmup, 1.0), 1.0
        )

    return fn


class ScaleByPytorchAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


# The reference optimizer (train_tasks.py:425, train_concap.py:466) is
# pytorch_transformers' AdamW, whose update is
#
#     m_t / (sqrt(v_t) + eps) * [sqrt(1-b2^t) / (1-b1^t)  if correct_bias]
#
# This differs from ``optax.scale_by_adam`` in two load-bearing ways:
# - eps is added to sqrt(v_t) BEFORE the bias correction (optax corrects
#   the moments first and adds eps to sqrt(nu_hat)),
# - ``correct_bias=False`` (reference multi-task training) drops the
#   correction entirely — the first steps are substantially smaller than
#   bias-corrected Adam's, which shapes early training dynamics.
# ``reference_adamw`` below implements these semantics as ONE fused
# transformation (pinned bit-tight by tests/test_training_parity.py).


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
        # float threshold, exactly as the reference passes it
        # (warmpu_steps = args.warmup_proportion * num_train_optimization_steps,
        # train_tasks.py:430)
        self.warmup_steps = float(self.total_steps * warmup_proportion)
        self.decay_factor = 1.0
        # ReduceLROnPlateau state (torch defaults: threshold_mode="rel")
        self.plateau_best = -float("inf")
        self.plateau_bad = 0
        self.plateau_cooldown = 0

    def _warm(self, step: float) -> float:
        return min(step / max(self.warmup_steps, 1.0), 1.0)

    def _tail(self, step: float) -> float:
        import math

        if self.kind in ("mannul", "automatic"):
            return self.decay_factor
        # cosine family: the annealer steps once per iteration past warmup
        # with T_max/T_0 = total_steps (train_tasks.py:444-452,:571-573) — so
        # t lags ``step`` by the warmup and the curve never quite reaches 0
        t = max(step - self.warmup_steps, 0.0)
        T = float(self.total_steps)
        if self.kind == "cosine_warm":
            t = t % T
        return 0.5 * (1.0 + math.cos(math.pi * min(t / T, 1.0)))

    def __call__(self, step) -> float:
        step = float(step)
        if step == 0.0 and self.kind != "automatic":
            # Construction-order quirk, verified against torch: the epoch
            # scheduler (LambdaLR/CosineAnnealingLR) is constructed AFTER the
            # warmup scheduler (train_tasks.py:431-457) and _LRScheduler
            # construction re-applies lr = initial_lr * lambda(0), clobbering
            # the warmup's 0 — so the very FIRST update of training runs at
            # the full base LR, not at warm(0)=0. ReduceLROnPlateau
            # ("automatic") sets nothing at construction, so there the 0
            # survives.
            return self.base_lr * self._tail(0.0)
        return self.base_lr * self._warm(step) * self._tail(step)

    def mid_iteration(self, step) -> float:
        """LR seen by the non-first tasks of iteration ``step``: the warmup
        scheduler has already stepped mid-iteration after the first task's
        optimizer.step (train_tasks.py:548-556), while the epoch/cosine
        scheduler steps only at iteration/epoch end (:571-573,:595-605)."""
        step = float(step)
        return self.base_lr * self._warm(step + 1.0) * self._tail(step)

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
        return not any(s in p for s in NO_DECAY_SUBSTRINGS)

    return jax.tree_util.tree_map_with_path(mask, params)


#: top-level head modules of ViLBERTForVLTasks (flax param keys). "cls" (the
#: pretraining heads) is computed in some forwards but consumed by no task
#: loss, so it participates in NO task's update.
ALL_HEAD_MODULES = (
    "vil_prediction", "vil_prediction_gqa", "vil_binary_prediction",
    "vil_logit_dense", "vil_tri_dense", "vision_logit_dense",
    "linguisic_logit_dense", "cls",
)

#: the head module each task type backpropagates through
#: (train/multitask.HEAD_FOR_TYPE, mapped to param-module names)
HEAD_MODULE_FOR_TYPE = {
    "VL-classifier": "vil_prediction",
    "VL-classifier-GQA": "vil_prediction_gqa",
    "VL-logit": "vil_logit_dense",
    "V-logit": "vision_logit_dense",
    "V-logit-mc": "vision_logit_dense",
    "VL-binary-classifier": "vil_binary_prediction",
    "VL-tri-classifier": "vil_tri_dense",
}


def task_update_mask(params, task_type: str) -> Any:
    """Which params PARTICIPATE in a task's optimizer step.

    The reference runs one optimizer.step() per task, and torch skips params
    whose .grad is None — i.e. everything outside that task's backward graph
    (other tasks' heads; the poolers for V-logit tasks, whose loss reads
    sequence_v only). Those params get NO moment update and NO weight decay
    from other tasks' steps (train_tasks.py:541-543 with modern torch
    zero_grad(set_to_none=True) semantics). Without this mask, unused heads
    drift between their tasks' turns: stale Adam momentum keeps moving them
    and weight decay keeps shrinking them — measurably faster head training
    than the reference (caught by tests/test_training_parity.py).
    """
    used = HEAD_MODULE_FOR_TYPE[task_type]
    pooled_unused = task_type in ("V-logit", "V-logit-mc")

    def mask(path, _):
        p = path_str(path)
        top = p.split(".", 1)[0]
        if top in ALL_HEAD_MODULES:
            return top == used
        if pooled_unused and (
            p.startswith("bert.t_pooler") or p.startswith("bert.v_pooler")
        ):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def reference_adamw(
    cfg: OptimizerConfig, params, *, ratios, update_mask=None,
    schedule=None, step_offset: int = 0,
) -> optax.GradientTransformation:
    """ONE fused AdamW transformation (pytorch_transformers semantics) with
    per-param lr RATIOS and an optional participation mask.

    update_p = -lr_t * ratio_p * [adam_scale * m/(sqrt(v)+eps) + wd_p * p]

    ``schedule=None`` is the external-LR mode: lr_t is omitted and the
    caller multiplies updates by the host-side schedule value
    (make_train_step(external_lr=True)). With a schedule, lr_t =
    schedule(count + step_offset) is applied in the same fusion — one pass
    over m/v/p/g per step. Measured perf-neutral vs the previous
    scale_by_pytorch_adam → add_decayed_weights → scale_by_lr chain on the
    CC bench (2061.8 vs 2057 samples/s/chip — XLA already fused the chain);
    the win is one state layout for internal- and external-LR modes plus
    the ``first_moment_dtype``/``second_moment_dtype`` options below.

    Masked params keep their moments untouched — matching torch's
    'if p.grad is None: continue' for params outside the task's backward
    graph. ratio 0.0 (frozen) also skips moment updates (frozen params are
    excluded from the reference's param groups entirely,
    train_tasks.py:391-398).

    State is (count, mu, nu) regardless of mask/schedule, so per-task
    transformations built with different masks share one TrainState.

    NOTE: with correct_bias=True the shared scalar ``count`` advances on
    every step while torch keeps per-param counts; exact only for
    correct_bias=False (the reference multi-task setting) or full masks.
    """
    decay = _decay_mask(params)
    if update_mask is None:
        update_mask = jax.tree.map(lambda _: True, params)
    participate = jax.tree.map(
        lambda use, r: bool(use) and r != 0.0, update_mask, ratios
    )
    b1, b2, eps, wd = cfg.beta1, cfg.beta2, cfg.eps, cfg.weight_decay
    mdt = jnp.dtype(cfg.first_moment_dtype)
    vdt = jnp.dtype(cfg.second_moment_dtype)

    def init_fn(params_):
        def zeros(dt):
            return jax.tree.map(lambda p: jnp.zeros(p.shape, dt), params_)

        return ScaleByPytorchAdamState(
            count=jnp.zeros((), jnp.int32), mu=zeros(mdt),
            nu=zeros(vdt),
        )

    def update_fn(updates, state, params_=None):
        # moments always ACCUMULATE in fp32; mdt/vdt compress storage only.
        # g is cast explicitly: with grad_dtype=bfloat16 the weak-typed
        # (1-b1)*g product would otherwise stay bf16, rounding the
        # fresh-gradient term once before the fp32 add (ADVICE r4).
        mu32 = jax.tree.map(
            lambda use, m, g: (
                b1 * m.astype(jnp.float32)
                + (1.0 - b1) * g.astype(jnp.float32)
                if use else m.astype(jnp.float32)
            ),
            participate, state.mu, updates,
        )
        nu32 = jax.tree.map(
            lambda use, v, g: (
                b2 * v.astype(jnp.float32)
                + (1.0 - b2) * jnp.square(g.astype(jnp.float32))
                if use else v.astype(jnp.float32)
            ),
            participate, state.nu, updates,
        )
        count = state.count + 1
        if cfg.correct_bias:
            t = count.astype(jnp.float32)
            scale = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        else:
            scale = 1.0
        # optax count convention: the k-th update (k>=1) sees count k-1
        lr_t = (schedule(state.count + step_offset)
                if schedule is not None else 1.0)

        def upd(use, ratio, dec, m, v, p):
            if not use:
                return jnp.zeros(p.shape, jnp.float32)
            u = scale * m / (jnp.sqrt(v) + eps)
            if wd and dec:
                u = u + wd * p.astype(jnp.float32)
            return (-lr_t * ratio) * u

        out = jax.tree.map(
            upd, participate, ratios, decay, mu32, nu32, params_
        )
        mu = (mu32 if mdt == jnp.float32
              else jax.tree.map(
                  lambda use, m, m0: m.astype(mdt) if use else m0,
                  participate, mu32, state.mu,
              ))
        nu = (nu32 if vdt == jnp.float32
              else jax.tree.map(
                  lambda use, v, v0: v.astype(vdt) if use else v0,
                  participate, nu32, state.nu,
              ))
        return out, ScaleByPytorchAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _base_transform(cfg: OptimizerConfig, schedule, params) -> optax.GradientTransformation:
    # adamw goes through reference_adamw in build_optimizer; this builds
    # the remaining optimizers only
    assert cfg.name != "adamw"
    if cfg.name == "radam":
        tx = optax.radam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps)
        if cfg.weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask(params)),
                tx,
            )
        return tx
    raise ValueError(cfg.name)


#: the param paths the reference's bert weight-name manifest covers — the
#: ORIGINAL text-BERT modules (config/bert-base-uncased_weight_name.json:
#: embeddings + encoder.layer.N). Everything else is vision/co-attention/
#: pooler/head weights that do not exist in a text-only BERT checkpoint.
TEXT_BERT_PREFIXES = ("bert.embeddings.", "bert.encoder.layer_")


def label_params(
    params,
    *,
    freeze_prefix="",
    head_lr: Optional[float] = None,
    pretrained_lr_scale: float = 1.0,
    vision_scratch: bool = False,
) -> Any:
    """Label each param "frozen" | "head" | "pretrained_scaled" | "base".

    ``freeze_prefix`` is a param-path prefix or a sequence of them (the
    reference's integer ``--freeze N`` expands to embeddings + text layers
    ≤ N, train_tasks.py:381-393 — see cli.train_tasks.freeze_prefixes).

    ``vision_scratch`` labels every param OUTSIDE the text-BERT manifest as
    "head" (lr 1e-4 in the reference, train_tasks.py:400-411): when the
    starting checkpoint is a text-only BERT, the fresh vision/co-attention
    weights train at the head LR while the pretrained text stream keeps
    base lr."""
    if isinstance(freeze_prefix, str):
        prefixes = (freeze_prefix,) if freeze_prefix else ()
    else:
        prefixes = tuple(fp for fp in freeze_prefix if fp)

    def label(path, _):
        p = path_str(path)
        if prefixes and p.startswith(prefixes):
            return "frozen"
        if head_lr is not None and any(p.startswith(h) for h in HEAD_PREFIXES):
            return "head"
        if vision_scratch and not p.startswith(TEXT_BERT_PREFIXES):
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
    step_offset: int = 0,
    update_mask=None,
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

    ``step_offset=1`` evaluates internal schedules at (update_count + 1):
    the reference CC loop calls scheduler.step() BEFORE optimizer.step()
    (train_concap.py:583-586), so its k-th update uses λ(k), k starting
    at 1 — not λ(k-1).

    ``update_mask`` (external_lr adamw only) restricts which params
    participate in the step — see task_update_mask. Different masks over
    the same params yield state-compatible transformations.
    """
    if cfg.schedule in EPOCH_SCHEDULES and not external_lr:
        raise ValueError(
            f"schedule {cfg.schedule!r} carries host state (epoch-level LR "
            "transitions) and requires external_lr=True"
        )
    if cfg.vision_scratch:
        assert cfg.head_lr is not None, (
            "vision_scratch trains the fresh vision weights at head_lr "
            "(1e-4 in the reference, train_tasks.py:400-411) — set head_lr"
        )
    labels = label_params(
        params,
        freeze_prefix=freeze_prefix,
        head_lr=cfg.head_lr,
        pretrained_lr_scale=cfg.pretrained_lr_scale,
        vision_scratch=cfg.vision_scratch,
    )
    schedule = make_schedule(cfg, cfg.learning_rate, total_steps)

    def group_lr(lr: float):
        if external_lr:
            return lr / cfg.learning_rate  # constant ratio
        sched = make_schedule(cfg, lr, total_steps)
        if step_offset:
            return lambda count, _s=sched: _s(count + step_offset)
        return sched

    if cfg.name == "adamw":
        # one fused transformation: per-param ratios + participation mask +
        # (internal mode) the schedule, all in a single pass over the state.
        # Every group's schedule is its base lr times the shared shape, so
        # ratios capture the reference's per-group lrs exactly.
        ratio_of = {
            "base": 1.0,
            "head": (cfg.head_lr / cfg.learning_rate
                     if cfg.head_lr is not None else 1.0),
            "pretrained_scaled": cfg.pretrained_lr_scale,
            "frozen": 0.0,
        }
        ratios = jax.tree.map(lambda lb: ratio_of[lb], labels)
        tx = reference_adamw(
            cfg, params, ratios=ratios, update_mask=update_mask,
            schedule=None if external_lr else schedule,
            step_offset=step_offset,
        )
        if cfg.grad_clip_norm:
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm), tx
            )
        return tx, schedule

    assert update_mask is None, (
        "update_mask is only supported for the adamw path"
    )
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
