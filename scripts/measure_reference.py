#!/usr/bin/env python
"""Same-hardware A/B: the ACTUAL reference torch training step vs ours.

BENCH's ``vs_baseline`` compares against an estimated 150 samples/s/chip for
the reference stack on a V100 (the repo publishes no numbers, BASELINE.md).
This script replaces estimation with measurement where both stacks can run
on identical silicon — this host's CPU:

- reference: ``vilbert.vilbert.BertForMultiModalPreTraining`` (imported
  read-only from /root/reference via tests/reference_loader.py) driven
  exactly like train_concap.py's inner loop — forward, the three pretraining
  losses summed, backward, AdamW step (torch.optim.AdamW stands in for the
  era pytorch_transformers AdamW; identical cost structure),
- ours: ``run-of-the-mill`` jitted train step (make_train_step over
  make_pretrain_loss_fn) on the jax CPU backend.

Both run fp32 (CPU has no bf16 units; this isolates framework/compiler
overhead from precision tricks), same config json, same shapes, same batch.
Prints one JSON line with both rates and the ratio.

Usage: python scripts/measure_reference.py [--batch 4] [--steps 3]
       [--config configs/bert_base_6layer_6conect.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

SEQ = 36
REGIONS = 37


def make_batch(rng, cfg_vocab, v_target_size, batch):
    b = {
        "input_ids": rng.randint(1, cfg_vocab, (batch, SEQ)).astype(np.int64),
        "image_feat": rng.randn(batch, REGIONS, 2048).astype(np.float32),
        "image_loc": rng.rand(batch, REGIONS, 5).astype(np.float32),
        "segment_ids": np.zeros((batch, SEQ), np.int64),
        "input_mask": np.ones((batch, SEQ), np.int64),
        "image_mask": np.ones((batch, REGIONS), np.int64),
        "lm_label_ids": np.where(
            rng.rand(batch, SEQ) < 0.15,
            rng.randint(0, cfg_vocab, (batch, SEQ)), -1,
        ).astype(np.int64),
        "image_label": np.where(
            rng.rand(batch, REGIONS - 1) < 0.15, 1, -1
        ).astype(np.int64),
        "image_target": rng.rand(batch, REGIONS - 1, v_target_size).astype(
            np.float32
        ),
        "is_next": rng.randint(0, 2, (batch,)).astype(np.int64),
    }
    b["image_target"] /= b["image_target"].sum(-1, keepdims=True)
    return b


def measure_reference(config_json, batch, steps):
    import torch

    from reference_loader import load_reference_vilbert

    ref = load_reference_vilbert()
    cfg = ref.BertConfig.from_json_file(config_json)
    model = ref.BertForMultiModalPreTraining(cfg)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    rng = np.random.RandomState(0)
    b = make_batch(rng, cfg.vocab_size, cfg.v_target_size, batch)
    t = {k: torch.from_numpy(v) for k, v in b.items()}

    def one_step():
        # train_concap.py:523-586: forward, sum of the three losses, backward,
        # optimizer.step + zero_grad
        masked_loss_t, masked_loss_v, next_sentence_loss = model(
            t["input_ids"], t["image_feat"], t["image_loc"],
            t["segment_ids"], t["input_mask"], t["image_mask"],
            t["lm_label_ids"], t["image_label"], t["image_target"],
            t["is_next"],
        )
        loss = (masked_loss_t + masked_loss_v + next_sentence_loss).mean()
        loss.backward()
        opt.step()
        opt.zero_grad()
        return float(loss)

    one_step()  # warmup (allocator, autograd graph caches)
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = one_step()
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return batch * steps / dt


def measure_ours(config_json, batch, steps, no_dropout=False):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vilbert_tpu.core.config import ModelConfig, OptimizerConfig
    from vilbert_tpu.models.vilbert import ViLBERTForPretraining
    from vilbert_tpu.parallel.train_step import TrainState, make_train_step
    from vilbert_tpu.train.optim import build_optimizer
    from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

    cfg = ModelConfig.from_json_file(config_json)  # fp32 compute
    model = ViLBERTForPretraining(cfg)
    rng = np.random.RandomState(0)
    b = make_batch(rng, cfg.vocab_size, cfg.v_target_size, batch)
    b = {k: v.astype(np.int32) if v.dtype == np.int64 else v
         for k, v in b.items()}

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, b["input_ids"], b["image_feat"], b["image_loc"]
    )["params"]
    tx, _ = build_optimizer(
        OptimizerConfig(learning_rate=1e-4, schedule="constant"), params, 1000
    )
    state = TrainState.create(params, tx)
    step_fn = make_train_step(
        make_pretrain_loss_fn(model, cfg, deterministic=no_dropout), tx
    )
    b = jax.tree.map(jax.device_put, b)

    key, sub = jax.random.split(key)
    state, metrics = step_fn(state, b, sub)  # compile + warmup
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, b, sub)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return batch * steps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--config", default="configs/bert_base_6layer_6conect.json")
    p.add_argument("--side", choices=["both", "reference", "ours"],
                   default="both",
                   help="measure one side only (run each in a fresh process "
                   "to keep allocator/thread state independent)")
    p.add_argument("--no_dropout", action="store_true",
                   help="ours only: disable dropout (attribution probe — the "
                   "counter-hash masks are ~free on the TPU VPU but cost "
                   "real time on one CPU core)")
    args = p.parse_args()

    out = {"metric": "cpu_train_step_samples_per_sec", "batch": args.batch,
           "steps": args.steps, "config": args.config}
    if args.side in ("both", "reference"):
        out["reference_torch"] = round(
            measure_reference(args.config, args.batch, args.steps), 3
        )
    if args.side in ("both", "ours"):
        out["ours_jax"] = round(
            measure_ours(args.config, args.batch, args.steps,
                         args.no_dropout), 3
        )
        if args.no_dropout:
            out["ours_dropout"] = "off"
    if "reference_torch" in out and "ours_jax" in out:
        out["ours_over_reference"] = round(
            out["ours_jax"] / out["reference_torch"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
