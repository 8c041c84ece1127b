"""Sharded, jit-compiled train/eval step builders.

Replaces the reference's training inner loop machinery:
- apex DDP ``delay_allreduce`` single post-backward allreduce
  (train_tasks.py:490-497) → XLA inserts the gradient ``psum`` over the
  mesh's data axis automatically ("computation follows data": params are
  replicated, the batch is sharded),
- ``--gradient_accumulation_steps`` loss division + deferred optimizer.step
  (train_concap.py:567-586) → a ``lax.scan`` over microbatches inside one
  compiled step,
- fp16 loss-scaling (FP16_Optimizer) → not needed: bf16 compute, fp32 state.

The step donates the previous state, so params/optimizer memory is reused
in-place in HBM.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vilbert_tpu.parallel.mesh import (
    batch_sharding,
    replicate_pytree,
    shard_batch_pytree,
)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


#: loss_fn(params, batch, rng) -> (scalar loss, metrics dict)
LossFn = Callable[[Any, Any, jax.Array], Tuple[jax.Array, Dict[str, jax.Array]]]


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    *,
    grad_accum: int = 1,
    loss_scale: float = 1.0,
    external_lr: bool = False,
    grad_dtype: Optional[str] = None,
    jit: bool = True,
) -> Callable[..., Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build a fused forward+backward+update step.

    With ``grad_accum > 1`` the batch pytree must carry a leading
    [grad_accum, micro_batch, ...] axis; gradients are averaged across
    microbatches via lax.scan (activations of only one microbatch live at a
    time). ``loss_scale`` mirrors the reference's per-task loss scaling
    (train_tasks.py:536: loss * loss_scale[task_id]).

    With ``external_lr=True`` the step takes a 4th scalar argument that
    multiplies the updates — build ``tx`` with unit learning rate (adamw is
    linear in lr, weight decay included) and drive the schedule from the
    host. This reproduces the reference multi-task semantics exactly:
    optimizer.step per task, warmup/LR advanced once per iteration
    (train_tasks.py:541-559).

    ``grad_dtype="bfloat16"`` differentiates w.r.t. a low-precision cast of
    the fp32 master params, so the backward's dW dots EMIT (and HBM-write)
    bf16 gradients and the fused adamw pass reads them at half the traffic;
    moments/updates still accumulate in fp32 inside ``reference_adamw``.
    Equivalent to computing every per-layer ``param.astype(compute_dtype)``
    cast once up front; the only numeric delta vs the default is that the
    few params the model keeps fp32 in compute (LayerNorm scales/biases)
    are rounded too, and the grads themselves carry bf16 mantissas into the
    moment update — no looser than the reference's apex fp16 recipe
    (train_concap.py:504, model.half()). Default off: fp32 grads preserve
    exact reference-trajectory parity.
    """

    grad_fn = jax.value_and_grad(
        lambda p, b, r: loss_fn(p, b, r), has_aux=True
    )

    def cast_for_grad(params: Any) -> Any:
        if grad_dtype is None:
            return params
        gd = jnp.dtype(grad_dtype)
        return jax.tree.map(
            lambda x: x.astype(gd) if x.dtype == jnp.float32 else x, params
        )

    def step_fn(state: TrainState, batch: Any, rng: jax.Array,
                lr: Optional[jax.Array] = None):
        if grad_accum == 1:
            (loss, metrics), grads = grad_fn(cast_for_grad(state.params), batch, rng)
        else:
            rngs = jax.random.split(rng, grad_accum)
            cast_params = cast_for_grad(state.params)

            def body(carry, xs):
                mb, r = xs
                (loss_i, metrics_i), g_i = grad_fn(cast_params, mb, r)
                g_acc, l_acc, m_acc = carry
                g_acc = jax.tree.map(jnp.add, g_acc, g_i)
                m_acc = jax.tree.map(jnp.add, m_acc, metrics_i)
                return (g_acc, l_acc + loss_i, m_acc), None

            zeros_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            # trace one microbatch to learn the metrics structure
            mb0 = jax.tree.map(lambda x: x[0], batch)
            (_, metrics0), _ = jax.eval_shape(
                lambda p, b, r: grad_fn(p, b, r), state.params, mb0, rng
            )
            zeros_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), metrics0)
            (grads, loss, metrics), _ = jax.lax.scan(
                body, (zeros_g, jnp.zeros((), jnp.float32), zeros_m), (batch, rngs)
            )
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree.map(lambda m: m * inv, metrics)

        if loss_scale != 1.0:
            grads = jax.tree.map(lambda g: g * loss_scale, grads)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        if external_lr:
            assert lr is not None, "external_lr step requires the lr argument"
            updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, new_params, new_opt_state)
        return new_state, metrics

    if jit:
        return jax.jit(step_fn, donate_argnums=(0,))
    return step_fn


def make_eval_step(
    forward_fn: Callable[..., Any], *, jit: bool = True
) -> Callable[..., Any]:
    """Wrap a pure forward for evaluation (no dropout, no grads)."""
    return jax.jit(forward_fn) if jit else forward_fn


def place(state: TrainState, batch: Any, mesh) -> Tuple[TrainState, Any]:
    """Place a train state (replicated) and batch (data-sharded) on a mesh."""
    state = TrainState(*replicate_pytree(tuple(state), mesh))
    batch = shard_batch_pytree(batch, mesh)
    return state, batch
