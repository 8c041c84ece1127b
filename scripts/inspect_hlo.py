#!/usr/bin/env python
"""Dump the optimized HLO of the headline bench step and histogram the
layout-copy and convert+reduce instructions by shape — tells you exactly
which tensors pay the copy/reduce tax that shows up in profile_step.py's
`copy` / `convert_reduce_fusion` buckets.

Usage: python scripts/inspect_hlo.py [--out /tmp/step.hlo.txt]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/step.hlo.txt")
    p.add_argument("--top", type=int, default=25)
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
    cfg = bench._bench_model_cfg()
    model = ViLBERTForPretraining(cfg)
    rng = np.random.RandomState(0)
    B, T, R = bench.BATCH, bench.SEQ, bench.REGIONS
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
    step = make_train_step(make_pretrain_loss_fn(model, cfg, lm_gather=12), tx)
    batch = jax.tree.map(jax.device_put, batch)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, key
    ).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)/1e6:.1f} MB)")

    def hist(pattern, title):
        counts = collections.Counter()
        for m in re.finditer(pattern, txt):
            counts[m.group(1)] += 1

        def nbytes(shape):
            m2 = re.match(r"(\w+)\[([\d,]*)\]", shape)
            if not m2:
                return 0
            dt = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4,
                  "pred": 1, "s8": 1, "u8": 1}.get(m2.group(1), 4)
            n = 1
            for d in m2.group(2).split(",") if m2.group(2) else []:
                n *= int(d)
            return n * dt

        rows = sorted(
            ((nbytes(s) * c, c, s) for s, c in counts.items()), reverse=True
        )
        total = sum(r[0] for r in rows)
        print(f"\n-- {title}: {sum(counts.values())} ops, "
              f"{total/1e6:.1f} MB total traffic --")
        for b, c, s in rows[: args.top]:
            print(f"  {c:4d} x {s:40s} {b/1e6:9.1f} MB")

    hist(r"= (\S+?)\{[^}]*\} copy\(", "layout copies")
    hist(r"(\S+?)\{?[^ ]* fusion\([^)]*\), kind=kLoop, "
         r"calls=%?convert_reduce", "convert_reduce fusions (by output)")
    # convert_reduce fusions: find fusion defs named convert_reduce and their
    # root shapes instead (robust across printer versions)
    sizes = collections.Counter()
    for m in re.finditer(r"%?convert_reduce_fusion[\w.]* \(([^)]*)\) -> ([^{ ]+)", txt):
        sizes[m.group(2)] += 1
    print("\n-- convert_reduce fusion signatures --")
    for s, c in sizes.most_common(args.top):
        print(f"  {c:4d} x {s}")


if __name__ == "__main__":
    main()
