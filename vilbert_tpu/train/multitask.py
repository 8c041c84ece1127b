"""12-in-1 multi-task training orchestration.

Rebuilds the reference train_tasks.py + task_utils.py machinery (call stack
SURVEY.md §3.1) TPU-first:

- each task gets its OWN compiled train step — static shapes per
  (seq_len, region_len, process-mode, head-type) bucket; the reference
  instead runs one model computing all 7 heads every step
  (vilbert.py:1684-1695),
- the process-mode reshapes (dialog/expand/retrieval/nlvr,
  task_utils.py:199-310) happen inside jit as static reshapes,
- per-task loss scaling lr_t/base_lr (train_tasks.py:239-251,:536),
- round-robin over tasks each iteration with MultiTaskStopOnPlateau gating
  (train_tasks.py:516-521),
- EXACT reference LR semantics: the optimizer steps once per task but the
  warmup/LR schedule advances once per iteration (train_tasks.py:541-559) —
  implemented by building the optimizer with unit learning rate (per-group
  constant ratios) and scaling updates by schedule(iteration) computed
  host-side (adamw/radam are linear in lr, weight decay included).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vilbert_tpu.core.config import ModelConfig, OptimizerConfig, TaskConfig, TrainConfig
from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
from vilbert_tpu.parallel.train_step import TrainState, make_train_step
from vilbert_tpu.train.controllers import MultiTaskStopController
from vilbert_tpu.train.losses import task_loss_and_score
from vilbert_tpu.train.optim import build_optimizer

logger = logging.getLogger(__name__)

#: head used per task type (reference task_utils.py:325-374)
HEAD_FOR_TYPE = {
    "VL-classifier": "vil_prediction",
    "VL-classifier-GQA": "vil_prediction_gqa",
    "VL-logit": "vil_logit",
    "V-logit": "vision_logit",
    "V-logit-mc": "vision_logit",
    "VL-binary-classifier": "vil_binary_prediction",
    "VL-tri-classifier": "vil_tri_prediction",
}

#: rows to skip before gathering mc options: the 100 detector boxes + global
#: row (reference task_utils.py:353 ``vision_logit[:, 101:]``)
MC_REGION_OFFSET = 101


def _local_rows(x) -> np.ndarray:
    """Rows of a (possibly multi-host) per-sample vector owned by THIS
    process. Single-host arrays pass through; globally-sharded arrays
    concatenate their addressable shards in row order."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    shards = sorted(
        x.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def process_batch(process: str, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Static process-mode reshapes (reference task_utils.py:199-310).

    Input tensors follow the dataset contract; output is a flat [B', ...]
    batch ready for the model, plus "num_options" left in the dict host-side.
    """
    b = dict(batch)
    feats, question = b["features"], b["question"]
    if process == "normal":
        return b
    if process in ("expand", "dialog"):
        # question [B, (rounds,) N, T] with one image per sample
        q = question.reshape(-1, question.shape[-1])
        n_opt = q.shape[0] // feats.shape[0]
        b["features"] = jnp.repeat(feats, n_opt, axis=0)
        b["spatials"] = jnp.repeat(b["spatials"], n_opt, axis=0)
        b["image_mask"] = jnp.repeat(b["image_mask"], n_opt, axis=0)
        b["question"] = q
        b["input_mask"] = b["input_mask"].reshape(-1, q.shape[-1])
        b["segment_ids"] = b["segment_ids"].reshape(-1, q.shape[-1])
        if b.get("target") is not None and b["target"].ndim > 1:
            b["target"] = b["target"].reshape(-1)
        return b
    if process == "retrieval":
        # every field carries its own [B, 4, ...] axis
        for k in ("features", "spatials", "image_mask", "question",
                  "input_mask", "segment_ids"):
            v = b[k]
            b[k] = v.reshape(-1, *v.shape[2:])
        return b
    if process == "nlvr":
        # [B, 2R, D] image pair -> [2B, R, D]; text repeated per image
        bsz, two_r = feats.shape[0], feats.shape[1]
        r = two_r // 2
        b["features"] = feats.reshape(bsz * 2, r, feats.shape[2])
        b["spatials"] = b["spatials"].reshape(bsz * 2, r, b["spatials"].shape[2])
        b["image_mask"] = b["image_mask"].reshape(bsz * 2, r)
        for k in ("question", "input_mask", "segment_ids"):
            b[k] = jnp.repeat(b[k], 2, axis=0)
        return b
    raise ValueError(process)


def _task_logits(
    model: ViLBERTForVLTasks,
    model_cfg: ModelConfig,
    task: TaskConfig,
    params,
    batch,
    rng,
    *,
    deterministic: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Shared forward + head reshape: returns (logits, target) for the task."""
    head = HEAD_FOR_TYPE[task.type]
    p = process_batch(task.process, batch)
    model_batch = p["question"].shape[0]
    task_ids = None
    if model_cfg.task_specific_tokens:
        task_ids = jnp.full((model_batch, 1), task.task_id, jnp.int32)
    out = model.apply(
        {"params": params},
        p["question"],
        p["features"],
        p["spatials"],
        p["segment_ids"],
        p["input_mask"],
        p["image_mask"],
        p.get("co_attention_mask"),
        task_ids,
        heads=(head,),
        deterministic=deterministic,
        rngs={} if deterministic else {"dropout": rng},
    )
    logits = getattr(out, head)
    target = p["target"]

    if task.type == "VL-logit":
        # rank options: [B*N, 1] -> [rows, N] where rows follows the
        # (possibly flattened) target — B for expand/retrieval,
        # B*rounds for dialog (task_utils.py:339-343, :199-246)
        logits = logits.reshape(target.shape[0], -1)
    elif task.type == "V-logit-mc":
        # gather option rows past the detector block (task_utils.py:352-360)
        mc = p["multiple_choice_ids"]
        logits = jnp.take_along_axis(
            logits[:, MC_REGION_OFFSET:, 0], mc, axis=1
        )[..., None]
    return logits, target


def make_task_loss_fn(
    model: ViLBERTForVLTasks,
    model_cfg: ModelConfig,
    task: TaskConfig,
    *,
    deterministic: bool = False,
) -> Callable:
    """loss_fn(params, batch, rng) computing this task's loss + batch score."""

    def loss_fn(params, batch, rng):
        logits, target = _task_logits(
            model, model_cfg, task, params, batch, rng,
            deterministic=deterministic,
        )
        loss, score = task_loss_and_score(task.type, logits, target)
        return loss, {"score": score}

    return loss_fn


def make_task_eval_fn(
    model: ViLBERTForVLTasks, model_cfg: ModelConfig, task: TaskConfig
) -> Callable:
    """Jitted eval fn(params, batch) -> ([rows] loss, [rows] score).

    Per-sample vectors let the eval loop pad final batches to a fixed shape
    (one XLA compile per task) and still compute exact sample-weighted
    metrics (reference per-sample accumulation, eval_tasks.py:276-301)."""
    from vilbert_tpu.train.losses import task_loss_and_score_per_sample

    @jax.jit
    def eval_fn(params, batch):
        logits, target = _task_logits(
            model, model_cfg, task, params, batch, None, deterministic=True
        )
        return task_loss_and_score_per_sample(task.type, logits, target)

    return eval_fn


@dataclass
class TaskRuntime:
    key: str
    cfg: TaskConfig
    loader: Any                      # train DataLoader
    val_loader: Optional[Any]
    loss_scale: float
    step_fn: Callable
    eval_fn: Callable                # per-sample (loss[rows], score[rows])
    iterator: Iterator = None
    num_iters: int = 0
    prefetch_batches: int = 0
    batch_sharding: Any = None
    batch_placer: Any = None         # multi-host global-batch assembly
    compute_dtype: str = "float32"   # enables bf16 feature transfer

    def next_batch(self):
        if self.iterator is None:
            if self.prefetch_batches > 0:
                # endless stream staged on device ahead of compute
                # (replaces the reference's pin_memory + cuda(non_blocking),
                # task_utils.py:181-187)
                from vilbert_tpu.data.prefetch import (
                    compress_for_transfer, device_prefetch, repeat_iterator,
                )

                def drop_qid(b):
                    b = {k: v for k, v in b.items() if k != "question_id"}
                    return compress_for_transfer(b, self.compute_dtype)

                self.iterator = device_prefetch(
                    repeat_iterator(lambda: iter(self.loader)),
                    size=self.prefetch_batches,
                    sharding=self.batch_sharding,
                    transform=drop_qid,
                    placer=self.batch_placer,
                )
            else:
                self.iterator = iter(self.loader)
        try:
            return next(self.iterator)
        except StopIteration:
            self.iterator = iter(self.loader)
            return next(self.iterator)


class MultiTaskTrainer:
    """Round-robin multi-task driver (reference train_tasks.py:510-610)."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        tasks: Dict[str, TaskConfig],
        loaders: Dict[str, Any],
        *,
        opt_cfg: Optional[OptimizerConfig] = None,
        train_cfg: Optional[TrainConfig] = None,
        val_loaders: Optional[Dict[str, Any]] = None,
        num_labels: int = 3129,
        init_params=None,
        seed: int = 0,
        mesh=None,
        num_train_epochs: int = 0,
        model_family: str = "vilbert",
        from_pretrained: str = "",
        dropout_prob: float = 0.1,
    ):
        self.model_cfg = model_cfg
        self.model_family = model_family
        if model_family == "vilbert":
            self.model = ViLBERTForVLTasks(
                model_cfg, num_labels=num_labels, dropout_prob=dropout_prob
            )
        elif model_family in ("basebert", "baseline"):
            # reference --baseline single-stream model (train_tasks.py:232-237)
            from vilbert_tpu.models.basebert import BaseBertForVLTasks

            self.model = BaseBertForVLTasks(model_cfg, num_labels=num_labels)
        else:
            raise ValueError(f"unknown model_family {model_family!r}")
        self.train_cfg = train_cfg or TrainConfig()
        #: grad accumulation: loaders yield batch_size/ga samples; one
        #: iteration scans ga of them and steps the optimizer once, so the
        #: optimization-step count matches the reference's
        #: median_num_iter*epochs//ga (train_tasks.py:352-354,:537-559)
        self.grad_accum = max(self.train_cfg.gradient_accumulation_steps, 1)
        val_loaders = val_loaders or {}

        # per-task LR -> base lr + loss scales (train_tasks.py:239-251).
        # default optimizer mirrors the reference multi-task AdamW:
        # correct_bias=False (train_tasks.py:425)
        base_lr = min(t.lr for t in tasks.values())
        self.loss_scales = {k: t.lr / base_lr for k, t in tasks.items()}
        opt_cfg = opt_cfg or OptimizerConfig(correct_bias=False)
        self.opt_cfg = opt_cfg.__class__(
            **{**opt_cfg.__dict__, "learning_rate": base_lr}
        )

        # iterations per epoch: the MAX of per-task
        # num_epoch * len(loader) / num_train_epochs — the reference's
        # (misnamed) median_num_iter = task_ave_iter_list[-1]
        # (train_tasks.py:333-352)
        self.num_train_epochs = num_train_epochs or max(
            t.num_epoch for t in tasks.values()
        )
        ave_iters = [
            int(t.num_epoch * len(loaders[k])
                * self.train_cfg.train_iter_multiplier
                / self.num_train_epochs)
            for k, t in tasks.items()
        ]
        self.median_num_iter = (
            max(ave_iters) // self.grad_accum if ave_iters else 0
        )
        #: per-task train-loader length — the reference's task_num_iters
        #: (task_utils.py:505), which gates per-task evals in the train loop
        #: (train_tasks.py:583-586)
        self.task_num_iters = {k: len(loaders[k]) for k in tasks}

        self.rng = jax.random.PRNGKey(seed)
        first_key = next(iter(tasks))
        first_batch = next(iter(loaders[first_key]))
        if init_params is None:
            init_rng, self.rng = jax.random.split(self.rng)
            p = process_batch(tasks[first_key].process, first_batch)
            task_ids = (
                np.zeros((p["question"].reshape(-1, p["question"].shape[-1]).shape[0], 1), np.int32)
                if model_cfg.task_specific_tokens else None
            )
            init_params = self.model.init(
                init_rng,
                np.asarray(p["question"]).reshape(-1, p["question"].shape[-1]),
                np.asarray(p["features"]).reshape(-1, *p["features"].shape[-2:]),
                np.asarray(p["spatials"]).reshape(-1, *p["spatials"].shape[-2:]),
                task_ids=task_ids,
            )["params"]
        if from_pretrained:
            # the flagship recipe: fine-tune from the CC-pretrained checkpoint
            # (reference train_tasks.py:370-375 VILBertForVLTasks.from_pretrained);
            # URLs download into the local cache first (utils.py:485-682)
            from vilbert_tpu.core.checkpoint import (
                load_params, load_pretrained_torch,
            )
            from vilbert_tpu.utils.cached_path import cached_path

            # format dispatch keys on the ORIGINAL name — cache filenames
            # are extension-less content hashes
            is_npz = from_pretrained.split("?", 1)[0].endswith(".npz")
            from_pretrained = cached_path(from_pretrained)
            if is_npz:
                loaded = load_params(from_pretrained)
                # .npz may be a pretraining artifact: keep task heads at init
                from vilbert_tpu.core.importer import _flatten, _unflatten

                flat = _flatten(init_params)
                lflat = _flatten(loaded)
                hits = {k: v for k, v in lflat.items()
                        if k in flat and np.shape(v) == np.shape(flat[k])}
                flat.update(hits)
                init_params = _unflatten(flat)
                logger.info("from_pretrained %s: %d/%d params loaded",
                            from_pretrained, len(hits), len(flat))
            else:
                family = ("basebert" if model_family in ("basebert", "baseline")
                          else "vilbert")
                init_params, report = load_pretrained_torch(
                    from_pretrained, init_params, family=family
                )
                logger.info(
                    "from_pretrained %s: %d loaded, %d kept at init, "
                    "%d unexpected", from_pretrained, len(report.loaded),
                    len(report.missing), len(report.unexpected),
                )
        self.params0 = init_params

        # schedule is a function of ITERATIONS: the LR advances once per
        # round-robin iteration while the optimizer steps once per task —
        # exact reference semantics (train_tasks.py:541-559) via the
        # external-lr step (SURVEY.md §7 hard part 2)
        total_iterations = self.median_num_iter * self.num_train_epochs or 1000
        self.tx, self.schedule = build_optimizer(
            self.opt_cfg, init_params, total_iterations,
            freeze_prefix=self.train_cfg.freeze_prefix,
            external_lr=True,
        )
        self.state = TrainState.create(init_params, self.tx)
        self.mesh = mesh
        self._batch_sharding = None
        self._batch_placer = None
        self._accum_placer = None
        if mesh is not None:
            from vilbert_tpu.parallel.mesh import batch_sharding, replicate_pytree

            self.state = TrainState(*replicate_pytree(tuple(self.state), mesh))
            if self.grad_accum > 1:
                # microbatches stay host-side in the per-task prefetch; the
                # stacked [ga, B_local, ...] batch is placed ONCE per
                # iteration with the data axis on the microbatch dim
                # (axis 1) — scan axis replicated. Multi-host composes with
                # grad accum exactly like pretrain.py: per-host shards are
                # assembled into the global array on axis 1 (the reference
                # runs DDP + grad accum together, train_tasks.py:537-541).
                from jax.sharding import NamedSharding, PartitionSpec

                if jax.process_count() > 1:
                    from vilbert_tpu.parallel.distributed import (
                        make_global_batch_fn,
                    )

                    self._accum_placer = make_global_batch_fn(
                        mesh, batch_axis=1
                    )
                else:
                    micro_sh = NamedSharding(mesh, PartitionSpec(None, "data"))
                    self._accum_placer = lambda b: jax.tree.map(
                        lambda x: jax.device_put(x, micro_sh), b
                    )
                # keep prefetch host-side: identity placer
                self._batch_placer = lambda b: b
            elif jax.process_count() > 1:
                # multi-host: loaders yield per-process shards; assemble the
                # global batch (SURVEY.md §2.5)
                from vilbert_tpu.parallel.distributed import make_global_batch_fn

                self._batch_placer = make_global_batch_fn(mesh)
            else:
                self._batch_sharding = batch_sharding(mesh)

        self.tasks: Dict[str, TaskRuntime] = {}
        for key, tcfg in tasks.items():
            loss_fn = make_task_loss_fn(self.model, model_cfg, tcfg)
            # per-task optimizer with this task's participation mask: params
            # outside the task's backward graph (other heads, poolers for
            # V-logit) get NO moment update / weight decay from this task's
            # step — torch skips grad-None params (train/optim.py
            # task_update_mask). State-compatible with self.tx.
            task_mask = None
            if self.opt_cfg.name == "adamw" and model_family == "vilbert":
                from vilbert_tpu.train.optim import task_update_mask

                task_mask = task_update_mask(init_params, tcfg.type)
            task_tx, _ = build_optimizer(
                self.opt_cfg, init_params, total_iterations,
                freeze_prefix=self.train_cfg.freeze_prefix,
                external_lr=True, update_mask=task_mask,
            )
            self.tasks[key] = TaskRuntime(
                key=key,
                cfg=tcfg,
                loader=loaders[key],
                val_loader=val_loaders.get(key),
                loss_scale=self.loss_scales[key],
                step_fn=make_train_step(
                    loss_fn, task_tx, loss_scale=self.loss_scales[key],
                    external_lr=True, grad_accum=self.grad_accum,
                    grad_dtype=self.train_cfg.grad_dtype or None,
                ),
                eval_fn=make_task_eval_fn(self.model, model_cfg, tcfg),
                num_iters=len(loaders[key]),
                prefetch_batches=self.train_cfg.prefetch_batches,
                batch_sharding=self._batch_sharding,
                batch_placer=self._batch_placer,
                compute_dtype=model_cfg.compute_dtype,
            )
        self.controller = MultiTaskStopController(
            list(tasks), train_iter_gap=self.train_cfg.train_iter_gap
        )
        self.global_step = 0
        self.epoch = 0
        self._last_val_scores: Dict[str, float] = {}
        self.metrics_history: List[Dict] = []
        self.metrics_logger = None  # optional MetricsLogger (attach_logger)
        self._ckpt = None

    # -- observability / checkpointing --------------------------------------

    def attach_logger(self, log_dir: str):
        from vilbert_tpu.train.logger import MetricsLogger

        self.metrics_logger = MetricsLogger(log_dir, list(self.tasks))
        return self.metrics_logger

    def _ckpt_manager(self):
        if self._ckpt is None:
            from vilbert_tpu.core.checkpoint import CheckpointManager

            self._ckpt = CheckpointManager(self.train_cfg.checkpoint_dir)
        return self._ckpt

    def save_checkpoint(
        self, step: Optional[int] = None, *, wait: bool = True
    ) -> None:
        """Full training state: params/opt/step + host state (controllers,
        logger, epoch) — the reference's pytorch_ckpt_latest.tar equivalent
        (train_tasks.py:612-635)."""
        host = {
            "controllers": self.controller.state_dict(),
            "global_step": self.global_step,
            "epoch": self.epoch,
        }
        if hasattr(self.schedule, "state_dict"):
            host["schedule"] = self.schedule.state_dict()
        if self.metrics_logger is not None:
            host["logger"] = self.metrics_logger.state_dict()
        self._ckpt_manager().save(
            step if step is not None else self.global_step, self.state,
            host_state=host, wait=wait,
        )

    def restore_checkpoint(
        self, step: Optional[int] = None, directory: Optional[str] = None
    ) -> int:
        """Resume model/opt/controller/logger state (train_tasks.py:463-481).

        ``directory`` overrides the configured checkpoint dir — the
        ``--resume_file`` CLI path."""
        if directory:
            from vilbert_tpu.core.checkpoint import CheckpointManager

            mngr = CheckpointManager(directory)
        else:
            mngr = self._ckpt_manager()
        state, host, step = mngr.restore(self.state, step=step)
        self.state = state
        if host:
            self.controller.load_state_dict(host.get("controllers", {}))
            self.global_step = host.get("global_step", 0)
            self.epoch = host.get("epoch", 0)
            if "schedule" in host and hasattr(self.schedule, "load_state_dict"):
                self.schedule.load_state_dict(host["schedule"])
            if self.metrics_logger is not None and "logger" in host:
                self.metrics_logger.load_state_dict(host["logger"])
        return step

    # -- loops --------------------------------------------------------------

    def train_iteration(self, iter_id: int) -> Dict[str, Dict[str, float]]:
        """One round-robin pass over all tasks (train_tasks.py:513-570)."""
        out = {}
        # LR comes from the iteration counter, not the per-task optimizer
        # step count. Reference quirk reproduced exactly: the warmup
        # scheduler steps right after the FIRST trained task's
        # optimizer.step (train_tasks.py:548-556), so within iteration i the
        # first task updates at λ(i) and every later task at λ(i+1).
        lr_first = jnp.asarray(
            float(self.schedule(self.global_step)), jnp.float32
        )
        if hasattr(self.schedule, "mid_iteration"):
            lr_rest_f = self.schedule.mid_iteration(self.global_step)
        else:
            lr_rest_f = self.schedule(self.global_step + 1)
        lr_rest = jnp.asarray(float(lr_rest_f), jnp.float32)
        first_task = True
        for key, task in self.tasks.items():
            if not self.controller.should_train(key, iter_id):
                continue
            lr = lr_first if first_task else lr_rest
            first_task = False
            if self.grad_accum > 1:
                # one iteration = ga divided batches scanned inside the step
                # (train_step grad_accum contract); loaders were built with
                # batch_size/ga (reference train_tasks.py:150-155). Stacked
                # host-side, then placed with the data axis on the
                # microbatch dim (multi-host: global assembly on axis 1).
                micro = [
                    {k: v for k, v in task.next_batch().items()
                     if k != "question_id"}
                    for _ in range(self.grad_accum)
                ]
                batch = jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]), *micro
                )
                if self._accum_placer is not None:
                    batch = self._accum_placer(batch)
            else:
                batch = task.next_batch()
                batch = {k: v for k, v in batch.items() if k != "question_id"}
                if self._batch_placer is not None:
                    batch = self._batch_placer(batch)
                elif self._batch_sharding is not None:
                    batch = jax.tree.map(
                        lambda x: jax.device_put(x, self._batch_sharding),
                        batch,
                    )
            self.rng, sub = jax.random.split(self.rng)
            self.state, metrics = task.step_fn(self.state, batch, sub, lr)
            out[key] = metrics
        if self.metrics_logger is not None:
            for key, m in out.items():
                self.metrics_logger.step_train(
                    self.global_step, key, float(m["loss"]), float(m["score"]),
                    lr=float(self.schedule(self.global_step)),
                )
        if out:
            # the reference advances global_step (and the warmup scheduler)
            # only when at least one task ran a forward this iteration — on
            # all-stopped iterations the warmup clock freezes
            # (train_tasks.py:543-559: the increment sits inside is_forward)
            self.global_step += 1
        return out

    def evaluate(self, key: str, max_batches: Optional[int] = None) -> Dict[str, float]:
        """Full val pass for one task; feeds the stop controller
        (train_tasks.py:639-668).

        Final ragged batches are padded to the loader's batch size (one
        compile per task) and metrics are exact sample-weighted means over
        the valid rows."""
        from vilbert_tpu.data.tasks import pad_batch

        task = self.tasks[key]
        assert task.val_loader is not None, f"no val loader for {key}"
        full_bs = getattr(task.val_loader, "batch_size", 0)
        tot_loss = tot_score = 0.0
        n_rows = 0
        for i, batch in enumerate(task.val_loader):
            if max_batches and i >= max_batches:
                break
            batch = {k: v for k, v in batch.items() if k != "question_id"}
            bsz = int(batch["features"].shape[0])
            if full_bs:
                batch, _ = pad_batch(batch, full_bs)
            loss_v, score_v = task.eval_fn(self.state.params, batch)
            # multi-host: the per-sample vectors are globally sharded over
            # the data axis; read THIS process's addressable rows (the rows
            # its loader contributed) — the cross-host sum happens on the
            # allgathered totals below
            loss_v = _local_rows(loss_v)
            score_v = _local_rows(score_v)
            # rows per sample > 1 for dialog (target flattened to B*rounds)
            rows_per_sample = loss_v.shape[0] // max(full_bs or bsz, 1)
            valid = bsz * max(rows_per_sample, 1)
            tot_loss += float(loss_v[:valid].sum())
            tot_score += float(score_v[:valid].sum())
            n_rows += valid
        if jax.process_count() > 1:
            # sum the per-host shard sums so every process sees the SAME
            # score — the stop controllers must stay in lockstep across
            # hosts or the round-robin jit schedules diverge (and hang)
            from jax.experimental import multihost_utils

            sums = multihost_utils.process_allgather(
                np.asarray([tot_loss, tot_score, float(n_rows)])
            )
            tot_loss, tot_score, n_rows = np.asarray(sums).sum(axis=0)
        result = {
            "loss": tot_loss / max(n_rows, 1),
            "score": tot_score / max(n_rows, 1),
        }
        self._last_val_scores[key] = result["score"]
        self.controller.step(key, result["score"])
        if self.metrics_logger is not None:
            self.metrics_logger.step_val(
                self.global_step, key, result["loss"], result["score"]
            )
        return result

    def _eval_due(self, epoch: int, it: int, num_epochs: int, key: str) -> bool:
        """Reference eval cadence (train_tasks.py:583-599): task ``key`` is
        evaluated after any reference-iteration ``iterId`` with
        ``iterId != 0 and iterId % task_num_iters[key] == 0`` — i.e. each
        time the task wraps its own train loader — and unconditionally at
        the last step of the last epoch.

        One of our iterations covers ``grad_accum`` reference iterIds
        (our median_num_iter is the reference's divided by grad_accum,
        train_tasks.py:352-354), so the check is "does any nonzero multiple
        of task_num_iters fall in this iteration's iterId window".

        The window is aligned on PARAM STATE, not on raw iterId: a reference
        eval after iterId ``s`` sees params after floor((s+1)/ga) optimizer
        steps (the window's optimizer.step runs only at (step+1)%ga==0,
        train_tasks.py:543), and after our iteration ``w`` the params have
        taken w+1 steps — so due-point s belongs to iteration
        w = floor((s+1)/ga) - 1, i.e. the window [w*ga + ga-1, (w+1)*ga +
        ga-1). For ga=1 this is the plain [w, w+1). (The controller update
        consequently lands one window later than the reference's mid-window
        eval would have placed it — the score itself is computed at the
        exact same param state.)"""
        n = self.task_num_iters.get(key, 0)
        ga = self.grad_accum
        lo = (epoch * self.median_num_iter + it) * ga + ga - 1
        hi = lo + ga  # param-state-aligned window of reference iterIds
        wrapped = n > 0 and (hi - 1) // n > (max(lo, 1) - 1) // n
        last = (
            epoch == num_epochs - 1 and it == self.median_num_iter - 1
        )
        return wrapped or last

    def train(
        self,
        num_epochs: int = 0,
        *,
        eval_cadence: str = "reference",
        lr_drop_epochs: Tuple[int, ...] = (5, 7),
        log_every: int = 20,
        hooks: Optional[list] = None,
    ):
        """Run the multi-task loop.

        ``eval_cadence``: "reference" follows the reference's per-task
        loader-wrap gating (train_tasks.py:583-586); "epoch" evaluates
        every task at every epoch end (simpler, equivalent frequency when
        every task has num_epoch == num_train_epochs)."""
        assert eval_cadence in ("reference", "epoch"), eval_cadence
        num_epochs = num_epochs or self.num_train_epochs
        for epoch in range(self.epoch, num_epochs):
            self.epoch = epoch
            t0 = time.perf_counter()
            for it in range(self.median_num_iter):
                # gate stopped tasks on the GLOBAL iterId — the reference's
                # train_iter_gap check uses iterId = step + epoch * median,
                # not the per-epoch step (train_tasks.py:514-521)
                metrics = self.train_iteration(
                    epoch * self.median_num_iter + it
                )
                if log_every and (it + 1) % log_every == 0:
                    host = {k: float(m["loss"]) for k, m in metrics.items()}
                    bad = [k for k, v in host.items() if not np.isfinite(v)]
                    if bad:
                        raise FloatingPointError(
                            f"non-finite loss at epoch {epoch} it {it + 1} "
                            f"for tasks {bad}"
                        )
                    line = " ".join(
                        f"{k}:{host[k]:.3f}/{float(m['score']):.3f}"
                        for k, m in metrics.items()
                    )
                    logger.info("epoch %d it %d %s", epoch, it + 1, line)
                if eval_cadence == "reference":
                    for key, task in self.tasks.items():
                        if task.val_loader is not None and self._eval_due(
                            epoch, it, num_epochs, key
                        ):
                            r = self.evaluate(key)
                            logger.info(
                                "epoch %d it %d eval %s loss %.4f score %.4f"
                                " in_stop=%s",
                                epoch, it, key, r["loss"], r["score"],
                                self.controller.controllers[key].in_stop,
                            )
                for hook in hooks or ():
                    hook(epoch, it, self.state, metrics)
            if eval_cadence == "epoch":
                for key, task in self.tasks.items():
                    if task.val_loader is not None:
                        r = self.evaluate(key)
                        logger.info(
                            "epoch %d eval %s loss %.4f score %.4f in_stop=%s",
                            epoch, key, r["loss"], r["score"],
                            self.controller.controllers[key].in_stop,
                        )
            # epoch-level LR scheduler transition (mannul ×0.2 at {5,7},
            # automatic ReduceLROnPlateau on summed val scores,
            # train_tasks.py:595-605)
            if hasattr(self.schedule, "on_epoch_end"):
                self.schedule.on_epoch_end(
                    epoch,
                    sum(self._last_val_scores.values())
                    if self._last_val_scores else None,
                )
            if epoch in lr_drop_epochs:
                # reference resets all stop controllers on LR-drop epochs
                # (train_tasks.py:607-610)
                self.controller.reset_all()
            if self.train_cfg.checkpoint_every:
                # async: orbax stages device arrays to host synchronously,
                # the disk write proceeds in background while the next epoch
                # trains (the reference blocks on multi-GB torch.save per
                # epoch, train_tasks.py:612-635)
                self.save_checkpoint(wait=False)
            logger.info(
                "epoch %d done in %.1fs", epoch, time.perf_counter() - t0
            )
        if self._ckpt is not None:
            self._ckpt.mngr.wait_until_finished()
        return self.state
