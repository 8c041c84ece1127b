"""Conceptual Captions pretraining: loss function + training driver.

Rebuilds the reference train_concap.py main loop (call stack SURVEY.md §3.2)
as one jit-compiled step over a data-parallel mesh: forward, three pretraining
losses, backward, optax update — gradient allreduce compiled by XLA over ICI.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vilbert_tpu.core.config import ModelConfig, OptimizerConfig
from vilbert_tpu.models.vilbert import ViLBERTForPretraining
from vilbert_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_pytree
from vilbert_tpu.parallel.train_step import TrainState, make_train_step
from vilbert_tpu.train.losses import pretrain_losses
from vilbert_tpu.train.optim import build_optimizer

logger = logging.getLogger(__name__)


def make_pretrain_loss_fn(
    model: ViLBERTForPretraining,
    cfg: ModelConfig,
    *,
    img_weight: float = 1.0,
    deterministic: bool = False,
    lm_gather: int = 0,
    img_gather: int = 0,
    apply_objective: bool = True,
) -> Callable:
    """loss_fn(params, batch, rng) for make_train_step.

    Replicates the objective handling of the reference loop
    (train_concap.py:535-559): objective==1 clears LM/region labels of
    misaligned pairs; objective==2 drops the alignment loss.
    ``apply_objective=False`` skips both transforms — the reference's
    per-epoch VALIDATION pass (train_concap.py:608-654) computes the three
    raw losses regardless of the training objective.

    ``lm_gather=K > 0`` projects only (up to) K masked positions per sample
    through the vocab LM head instead of the full sequence — identical loss
    whenever a sample has ≤ K masked tokens (at 15% of ≤36 tokens, K=12
    covers >99.8% of samples; overflow positions are excluded from the loss,
    numerator and denominator alike). Saves ~2/3 of the LM-head FLOPs.

    ``img_gather=K > 0`` is the image-head analog: only (up to) K masked
    regions go through the v_hidden transform + [v_hidden, v_target_size]
    decoder and the KL/MSE loss — identical loss whenever every sample has
    <= K masked regions. Applies to visual_target 0/1 (per-row losses); NCE
    (visual_target=2) samples negatives across all regions and keeps the
    full projection.
    """
    use_img_gather = bool(img_gather) and cfg.visual_target in (0, 1)

    def loss_fn(params, batch: Dict[str, jax.Array], rng: jax.Array):
        drop_rng, nce_rng = jax.random.split(rng)
        lm_labels = batch["lm_label_ids"]
        lm_positions = None
        if lm_gather:
            # stable order of masked positions first; unmasked slots point
            # at position 0 with label -1 (ignored by the CE)
            masked = lm_labels != -1
            order = jnp.argsort(~masked, axis=1, stable=True)[:, :lm_gather]
            lm_labels = jnp.where(
                jnp.take_along_axis(masked, order, axis=1),
                jnp.take_along_axis(lm_labels, order, axis=1),
                -1,
            )
            lm_positions = order.astype(jnp.int32)
        image_label = batch["image_label"]
        image_target = batch["image_target"]
        img_positions = None
        if use_img_gather:
            # masked regions first (stable); image_label row i corresponds
            # to sequence_v row i+1 (the global mean feature occupies row 0,
            # vilbert.py:1506) — offset the gather indices accordingly
            vmasked = image_label == 1
            vorder = jnp.argsort(~vmasked, axis=1, stable=True)[:, :img_gather]
            image_label = jnp.where(
                jnp.take_along_axis(vmasked, vorder, axis=1), 1, -1
            )
            image_target = jnp.take_along_axis(
                image_target, vorder[:, :, None], axis=1
            )
            img_positions = (vorder + 1).astype(jnp.int32)
        out = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["image_feat"],
            batch["image_loc"],
            batch["segment_ids"],
            batch["input_mask"],
            batch["image_mask"],
            lm_positions=lm_positions,
            img_positions=img_positions,
            deterministic=deterministic,
            rngs={} if deterministic else {"dropout": drop_rng},
        )
        if apply_objective and cfg.objective == 1:
            aligned = (batch["is_next"] == 0)[:, None]
            lm_labels = jnp.where(aligned, lm_labels, -1)
            image_label = jnp.where(aligned, image_label, -1)

        losses = pretrain_losses(
            out,
            lm_labels,
            image_label,
            image_target,
            batch["is_next"],
            visual_target=cfg.visual_target,
            num_negative=cfg.num_negative,
            rng=nce_rng,
            img_gathered=use_img_gather,
        )
        nsp = losses.next_sentence_loss
        if apply_objective and cfg.objective == 2:
            nsp = nsp * 0.0
        loss = losses.masked_lm_loss + losses.masked_img_loss * img_weight + nsp
        metrics = {
            "masked_loss_t": losses.masked_lm_loss,
            "masked_loss_v": losses.masked_img_loss,
            "next_sentence_loss": losses.next_sentence_loss,
        }
        return loss, metrics

    return loss_fn


def _pretrain_model(model_cfg: ModelConfig, model_family: str):
    """Model for pretraining: two-stream ViLBERT or the single-stream
    baseline (reference --baseline, train_concap.py:397-414)."""
    if model_family == "basebert":
        from vilbert_tpu.models.basebert import BaseBertForPretraining

        return BaseBertForPretraining(model_cfg)
    assert model_family == "vilbert", model_family
    return ViLBERTForPretraining(model_cfg)


def evaluate_pretraining(
    model_cfg: ModelConfig,
    params,
    val_loader: Iterable[Dict[str, Any]],
    *,
    img_weight: float = 1.0,
    lm_gather: int = 0,
    img_gather: int = 0,
    mesh=None,
    seed: int = 0,
    max_batches: int = 0,
    model_family: str = "vilbert",
) -> Dict[str, float]:
    """Full validation pass with the three pretraining losses.

    Rebuilds the reference's per-epoch CC validation loop
    (train_concap.py:608-654: model.eval() + torch.no_grad over the val
    loader, averaging masked_loss_t / masked_loss_v / next_sentence_loss).
    Deterministic forward (no dropout); the NCE negative sampling of
    visual_target=2 uses a fixed per-batch rng so results are reproducible.

    Returns mean {"loss", "masked_loss_t", "masked_loss_v",
    "next_sentence_loss"} over the batches.
    """
    from vilbert_tpu.data.prefetch import compress_for_transfer
    from vilbert_tpu.parallel.mesh import batch_sharding

    model = _pretrain_model(model_cfg, model_family)
    # apply_objective=False: the reference val loop computes the three RAW
    # losses (no objective-1 label clearing, no objective-2 nsp zeroing) —
    # train_concap.py:608-654
    loss_fn = make_pretrain_loss_fn(
        model, model_cfg, img_weight=img_weight, deterministic=True,
        lm_gather=lm_gather, img_gather=img_gather, apply_objective=False,
    )

    @jax.jit
    def eval_step(p, batch, rng):
        loss, metrics = loss_fn(p, batch, rng)
        out = dict(metrics)
        out["loss"] = loss
        return out

    placer = None
    sharding = None
    if mesh is not None and jax.process_count() > 1:
        # per-host val shards -> one global batch (same as training)
        from vilbert_tpu.parallel.distributed import make_global_batch_fn

        placer = make_global_batch_fn(mesh)
    elif mesh is not None:
        sharding = batch_sharding(mesh)
    rng = jax.random.PRNGKey(seed)
    totals: Dict[str, float] = {}
    n = 0
    for i, batch in enumerate(val_loader):
        if max_batches and i >= max_batches:
            break
        batch = {k: v for k, v in batch.items() if k != "image_id"}
        batch = compress_for_transfer(
            batch, model_cfg.compute_dtype,
            raw_feature_targets=model_cfg.visual_target != 0,
        )
        if placer is not None:
            batch = placer(batch)
        elif sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch
            )
        rng, sub = jax.random.split(rng)
        metrics = jax.device_get(eval_step(params, batch, sub))
        for k, v in metrics.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in totals.items()}


def run_pretraining(
    model_cfg: ModelConfig,
    opt_cfg: OptimizerConfig,
    train_loader: Iterable[Dict[str, Any]],
    *,
    num_steps: int,
    seed: int = 0,
    img_weight: float = 1.0,
    grad_accum: int = 1,
    lm_gather: int = 0,
    img_gather: int = 0,
    mesh=None,
    init_params=None,
    log_every: int = 20,
    val_loader: Optional[Iterable] = None,
    val_every: int = 0,
    val_history: Optional[list] = None,
    hooks: Optional[list] = None,
    model_family: str = "vilbert",
    freeze_prefix="",
    resume_dir: str = "",
    start_step: int = -1,
    grad_dtype: str = "",
) -> TrainState:
    """Minimal pretraining driver; CLI wiring lives in cli/train_concap.py.

    With ``val_loader`` set, a full validation pass (the reference's
    per-epoch val loop, train_concap.py:608-654) runs every ``val_every``
    steps (default: once after the final step); results are logged and
    appended to ``val_history`` as (step, metrics dict) when provided.

    ``model_family="basebert"`` pretrains the single-stream baseline
    (reference --baseline, train_concap.py:397-414); ``freeze_prefix``
    freezes param-path prefixes exactly like the multi-task trainer
    (reference --freeze on train_concap.py:171-176).
    """
    from vilbert_tpu.data.prefetch import device_prefetch, repeat_iterator

    mesh = mesh or make_mesh()
    model = _pretrain_model(model_cfg, model_family)
    rng = jax.random.PRNGKey(seed)

    batches = repeat_iterator(lambda: iter(train_loader))
    first = next(batches)
    if init_params is None:
        init_rng, rng = jax.random.split(rng)
        init_params = model.init(
            init_rng,
            first["input_ids"],
            first["image_feat"],
            first["image_loc"],
            first["segment_ids"],
            first["input_mask"],
            first["image_mask"],
        )["params"]

    # step_offset=1: the reference steps the LR scheduler BEFORE the
    # optimizer (train_concap.py:583-586) — update k trains at λ(k), k≥1
    tx, schedule = build_optimizer(opt_cfg, init_params, num_steps,
                                   step_offset=1, freeze_prefix=freeze_prefix)
    state = TrainState.create(init_params, tx)
    first_step = 0
    if resume_dir:
        # full-state resume (params + optimizer + step), reference
        # --resume_file/--start_epoch (train_concap.py:416-438)
        from vilbert_tpu.core.checkpoint import CheckpointManager

        mngr = CheckpointManager(resume_dir)
        state, _, ckpt_step = mngr.restore(state)
        first_step = start_step if start_step >= 0 else ckpt_step
        logger.info("resumed from %s at step %d", resume_dir, first_step)
    state = TrainState(*replicate_pytree(tuple(state), mesh))

    loss_fn = make_pretrain_loss_fn(
        model, model_cfg, img_weight=img_weight, lm_gather=lm_gather,
        img_gather=img_gather,
    )
    step_fn = make_train_step(loss_fn, tx, grad_accum=grad_accum,
                              grad_dtype=grad_dtype or None)

    import itertools

    from jax.sharding import NamedSharding, PartitionSpec

    def host_transform(b):
        from vilbert_tpu.data.prefetch import compress_for_transfer

        b = {k: v for k, v in b.items() if k != "image_id"}
        b = compress_for_transfer(
            b, model_cfg.compute_dtype,
            raw_feature_targets=model_cfg.visual_target != 0,
        )
        if grad_accum > 1:
            # loader batches are [B, ...]; the grad-accum scan consumes
            # [grad_accum, B//grad_accum, ...] microbatches
            def split(x):
                assert x.shape[0] % grad_accum == 0, (
                    f"batch size {x.shape[0]} not divisible by "
                    f"grad_accum {grad_accum}"
                )
                return x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]
                )

            b = jax.tree.map(split, b)
        return b

    # with grad_accum the data axis shards the microbatch dim (axis 1),
    # not the scan dim
    placer = None
    if jax.process_count() > 1:
        # multi-host: this process holds only its batch shard; assemble the
        # global array (SURVEY.md §2.5; reference per-rank shards,
        # train_concap.py:290-294)
        from vilbert_tpu.parallel.distributed import make_global_batch_fn

        # with grad_accum the host_transform has already reshaped to
        # [grad_accum, B_local//grad_accum, ...]; the per-host shard lives
        # on axis 1
        placer = make_global_batch_fn(
            mesh, batch_axis=1 if grad_accum > 1 else 0
        )
        sharding = None
    elif grad_accum > 1:
        sharding = NamedSharding(mesh, PartitionSpec(None, "data"))
    else:
        sharding = batch_sharding(mesh)
    stream = device_prefetch(
        itertools.chain([first], batches), sharding=sharding, size=2,
        transform=host_transform, placer=placer,
    )
    def run_validation(step: int) -> None:
        metrics = evaluate_pretraining(
            model_cfg, state.params, val_loader,
            img_weight=img_weight, lm_gather=lm_gather,
            img_gather=img_gather, mesh=mesh,
            model_family=model_family,
        )
        logger.info(
            "validation @ step %d: loss %.4f (t %.4f v %.4f nsp %.4f)",
            step, metrics.get("loss", float("nan")),
            metrics.get("masked_loss_t", float("nan")),
            metrics.get("masked_loss_v", float("nan")),
            metrics.get("next_sentence_loss", float("nan")),
        )
        if val_history is not None:
            val_history.append((step, metrics))

    t0 = time.perf_counter()
    for step in range(first_step, num_steps):
        batch = next(stream)
        batch.pop("image_id", None)
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, step_rng)
        if log_every and (step + 1) % log_every == 0:
            metrics = jax.device_get(metrics)
            if not np.isfinite(metrics["loss"]):
                # failure detection the reference lacks (it ran
                # torch.autograd.set_detect_anomaly in the hot loop instead,
                # train_tasks.py:512) — fail fast with context
                raise FloatingPointError(
                    f"non-finite loss at step {step + 1}: {metrics}"
                )
            dt = time.perf_counter() - t0
            logger.info(
                "step %d loss %.4f (t %.4f v %.4f nsp %.4f) lr %.2e %.2f it/s",
                step + 1, metrics["loss"], metrics["masked_loss_t"],
                metrics["masked_loss_v"], metrics["next_sentence_loss"],
                float(schedule(step + 1)), log_every / dt,
            )
            t0 = time.perf_counter()
        for hook in hooks or ():
            hook(step, state, metrics)
        if (
            val_loader is not None and val_every
            and (step + 1) % val_every == 0
        ):
            run_validation(step + 1)
            t0 = time.perf_counter()  # don't count val time in it/s
    if val_loader is not None and (
        not val_every or num_steps % val_every != 0
    ):
        run_validation(num_steps)
    return state
