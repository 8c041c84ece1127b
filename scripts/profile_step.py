#!/usr/bin/env python
"""Capture a jax.profiler trace of the headline bench step and print the
device op-time breakdown (top fusions, grouped).

Usage: python scripts/profile_step.py [--lm_gather N] [--steps N]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--lm_gather", type=int, default=12)
    p.add_argument("--out", default="/tmp/vilbert_profile")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--config", default="",
                   help="model config JSON (default: headline bench config)")
    p.add_argument("--batch", type=int, default=0)
    args = p.parse_args()

    import jax
    import numpy as np

    import bench
    from vilbert_tpu.core.config import OptimizerConfig
    from vilbert_tpu.models.vilbert import ViLBERTForPretraining
    from vilbert_tpu.parallel.train_step import TrainState, make_train_step
    from vilbert_tpu.train.optim import build_optimizer
    from vilbert_tpu.train.pretrain import make_pretrain_loss_fn
    from vilbert_tpu.utils.cache import setup_tpu_defaults

    setup_tpu_defaults()
    if args.config:
        from vilbert_tpu.core.config import ModelConfig

        cfg = ModelConfig.from_json_file(args.config, compute_dtype="bfloat16")
    else:
        cfg = bench._bench_model_cfg()
    model = ViLBERTForPretraining(cfg)
    rng = np.random.RandomState(0)
    B, T, R = args.batch or bench.BATCH, bench.SEQ, bench.REGIONS
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
        "image_feat": rng.randn(B, R, 2048).astype(np.float32),
        "image_loc": rng.rand(B, R, 5).astype(np.float32),
        "segment_ids": np.zeros((B, T), np.int32),
        "input_mask": np.ones((B, T), np.int32),
        "image_mask": np.ones((B, R), np.int32),
        "lm_label_ids": np.where(
            rng.rand(B, T) < 0.15, rng.randint(0, cfg.vocab_size, (B, T)), -1
        ).astype(np.int32),
        "image_label": np.where(rng.rand(B, R - 1) < 0.15, 1, -1).astype(np.int32),
        "image_target": rng.rand(B, R - 1, cfg.v_target_size).astype(np.float32),
        "is_next": rng.randint(0, 2, (B,)).astype(np.int32),
    }
    batch["image_target"] /= batch["image_target"].sum(-1, keepdims=True)

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, batch["input_ids"], batch["image_feat"], batch["image_loc"]
    )["params"]
    tx, _ = build_optimizer(
        OptimizerConfig(learning_rate=1e-4, schedule="constant"), params, 1000
    )
    state = TrainState.create(params, tx)
    step_fn = make_train_step(
        make_pretrain_loss_fn(model, cfg, lm_gather=args.lm_gather), tx
    )
    batch = jax.tree.map(jax.device_put, batch)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
    float(metrics["loss"])

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    report(args.out, args.steps, args.top)


def report(out_dir: str, steps: int, top: int) -> None:
    """Aggregate device-plane op durations from the newest xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {out_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    import re

    per_op = collections.Counter()
    per_group = collections.Counter()
    total = 0.0
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue  # exclusive per-HLO busy time lives here
            for ev in line.events:
                md = ev_names[ev.metadata_id]
                dur = ev.duration_ps / 1e9  # ms
                name = md.name.split(" = ")[0].lstrip("%")
                per_op[name] += dur
                # group by op kind: strip trailing .N / digits
                group = re.sub(r"[.\d]+$", "", name)
                per_group[group] += dur
                total += dur
    print(f"parsed {paths[-1]}")
    print(f"device busy {total / steps:.1f} ms/step ({steps} steps)")
    print("\n-- by op kind --")
    for name, ms in per_group.most_common(25):
        print(f"{ms / steps:9.3f} ms/step  {name}")
    print("\n-- top individual HLOs --")
    for name, ms in per_op.most_common(top):
        print(f"{ms / steps:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
