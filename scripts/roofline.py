#!/usr/bin/env python
"""Per-fusion roofline for the headline CC pretraining step.

For every HLO the profiler attributes device time to, compute from the
optimized HLO text:
  - FLOPs (sum over `dot`s inside the fusion: 2 * prod(result) * K)
  - HBM bytes (operand + result buffer sizes — on TPU every fusion reads
    its operands from HBM and writes its result back; there is no cache)
and compare the achieved time against the roofline bound
  t_bound = max(FLOPs / peak_flops, bytes / hbm_bw).

Usage: python scripts/roofline.py [--steps N] [--top N] [--json out.json]
                                  [--peak_tflops 197] [--hbm_gbs 819]

Defaults are TPU v5e (v5 lite): 197 bf16 TFLOP/s, 819 GB/s HBM.
"""

import argparse
import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Bytes of one shape token `bf16[256,36,768]{2,1,0}` or a tuple."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def shape_elems(shape_str: str):
    m = _SHAPE_RE.search(shape_str)
    if not m:
        return None, []
    dt, dims = m.groups()
    return dt, [int(d) for d in dims.split(",") if d]


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*((?:\([^=]*?\))|(?:\w+\[[\d,]*\]\S*))\s+"
    r"([\w-]+)\((.*)$"
)


def parse_hlo(text: str):
    """Parse optimized HLO text into per-computation instruction tables.

    Returns {comp_name: {instr_name: (shape_str, op, args_str)}}."""
    comps = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.-]+)\s+\([^)]*\)\s*->", line)
        if m and ("{" in line or line.rstrip().endswith("->")):
            # computation header like: %fused_computation.1 (param_0: ...) -> ... {
            cur = m.group(1)
            comps[cur] = {}
            continue
        if cur is None:
            continue
        im = _INSTR_RE.match(line)
        if im:
            name, shape, op, rest = im.groups()
            comps[cur][name] = (shape, op, rest)
    return comps


def dot_flops(shape_str, rest, table):
    """FLOPs of one dot: 2 * prod(result dims) * prod(contracting dims)."""
    _, out_dims = shape_elems(shape_str)
    # operands: first two %refs in rest
    ops = re.findall(r"%?([\w.-]+)", rest.split("),")[0])
    lhs = next((o for o in ops if o in table), None)
    cm = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", rest)
    if lhs is None or cm is None:
        return 0
    _, lhs_dims = shape_elems(table[lhs][0])
    k = 1
    for i in (int(x) for x in cm.group(1).split(",") if x):
        if i < len(lhs_dims):
            k *= lhs_dims[i]
    out = 1
    for d in out_dims:
        out *= d
    return 2 * out * k


def analyze(hlo_text: str):
    """Per-entry-instruction {name: {flops, bytes, op}} from optimized HLO."""
    comps = parse_hlo(hlo_text)
    entry = None
    for name, table in comps.items():
        # the entry computation contains the fusions the profiler names;
        # pick the computation with the most fusion instructions
        nfus = sum(1 for _, (s, op, r) in table.items() if op == "fusion")
        if entry is None or nfus > entry[1]:
            entry = (name, nfus, table)
    _, _, table = entry

    info = {}
    for name, (shape, op, rest) in table.items():
        bytes_ = shape_bytes(shape)
        flops = 0
        if op == "fusion":
            # operand bytes: resolve %refs defined in the entry table
            for ref in re.findall(r"%([\w.-]+)", rest):
                if ref in table:
                    bytes_ += shape_bytes(table[ref][0])
            cm = re.search(r"calls=%?([\w.-]+)", rest)
            if cm and cm.group(1) in comps:
                inner = comps[cm.group(1)]
                for iname, (ishape, iop, irest) in inner.items():
                    if iop == "dot":
                        flops += dot_flops(ishape, irest, inner)
        elif op == "dot":
            for ref in re.findall(r"%([\w.-]+)", rest):
                if ref in table:
                    bytes_ += shape_bytes(table[ref][0])
            flops = dot_flops(shape, rest, table)
        elif op in ("copy", "copy-start", "bitcast", "get-tuple-element"):
            for ref in re.findall(r"%([\w.-]+)", rest):
                if ref in table:
                    bytes_ += shape_bytes(table[ref][0])
        info[name] = {"flops": flops, "bytes": bytes_, "op": op}
    return info


def profile_times(out_dir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {out_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    per_op = collections.Counter()
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_names[ev.metadata_id]
                name = md.name.split(" = ")[0].lstrip("%")
                per_op[name] += ev.duration_ps / 1e9  # ms
    return {k: v / steps for k, v in per_op.items()}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--lm_gather", type=int, default=12)
    p.add_argument("--peak_tflops", type=float, default=197.0)
    p.add_argument("--hbm_gbs", type=float, default=819.0)
    p.add_argument("--out", default="/tmp/vilbert_roofline")
    p.add_argument("--json", default="")
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
        "image_label": np.where(
            rng.rand(B, R - 1) < 0.15, 1, -1
        ).astype(np.int32),
        "image_target": rng.rand(B, R - 1, cfg.v_target_size).astype(
            np.float32
        ),
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
    step_raw = make_train_step(
        make_pretrain_loss_fn(model, cfg, lm_gather=args.lm_gather), tx,
        jit=False,
    )
    import functools

    step_fn = jax.jit(step_raw, donate_argnums=(0,))
    batch = jax.tree.map(jax.device_put, batch)

    lowered = step_fn.lower(state, batch, key)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    info = analyze(hlo_text)
    print(f"parsed HLO: {len(info)} entry instructions, "
          f"{sum(1 for v in info.values() if v['op'] == 'fusion')} fusions")

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
    times = profile_times(args.out, args.steps)

    peak_flops = args.peak_tflops * 1e12
    hbm = args.hbm_gbs * 1e9
    rows = []
    unmatched_ms = 0.0
    for name, ms in times.items():
        meta = info.get(name)
        if meta is None:
            unmatched_ms += ms
            continue
        t_mxu = meta["flops"] / peak_flops * 1e3
        t_hbm = meta["bytes"] / hbm * 1e3
        bound = max(t_mxu, t_hbm)
        rows.append({
            "name": name, "op": meta["op"], "ms": ms,
            "gflops": meta["flops"] / 1e9, "mbytes": meta["bytes"] / 1e6,
            "bound_ms": bound,
            "bound_by": "mxu" if t_mxu >= t_hbm else "hbm",
            "pct_of_bound": (bound / ms * 100) if ms > 0 else 0.0,
        })
    rows.sort(key=lambda r: -r["ms"])

    total_ms = sum(r["ms"] for r in rows) + unmatched_ms
    total_bound = sum(r["bound_ms"] for r in rows)
    print(f"\ndevice busy {total_ms:.1f} ms/step; "
          f"roofline bound of matched ops {total_bound:.1f} ms "
          f"({unmatched_ms:.1f} ms unmatched by the HLO parse)")
    hdr = (f"{'ms/step':>8} {'bound':>8} {'%bound':>7} {'by':>4} "
           f"{'GFLOP':>8} {'MB':>8}  name")
    print(hdr)
    for r in rows[: args.top]:
        print(f"{r['ms']:8.3f} {r['bound_ms']:8.3f} {r['pct_of_bound']:6.1f}%"
              f" {r['bound_by']:>4} {r['gflops']:8.2f} {r['mbytes']:8.1f}"
              f"  {r['name'][:60]}")
    covered = sum(r["ms"] for r in rows[: args.top])
    print(f"(top {args.top} cover {covered:.1f} ms = "
          f"{covered / total_ms * 100:.0f}% of device time)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "total_ms": total_ms, "total_bound_ms": total_bound,
                "unmatched_ms": unmatched_ms, "rows": rows[:50],
            }, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
