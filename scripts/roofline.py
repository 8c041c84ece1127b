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

    Returns {comp_name: {instr_name: (shape_str, op, args_str)}}.
    Header params may be tuple-typed (nested parens), so match greedily up
    to the ` -> ` return-type arrow rather than `\\([^)]*\\)`."""
    comps = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.-]+)\s+\(.*\)\s*->", line)
        if m and ("{" in line or line.rstrip().endswith("->")):
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


_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def logical_group(rest: str, instr_name: str) -> str:
    """Collapse an instruction to its logical model-op family.

    Uses the HLO metadata op_name (the jax primitive path), normalizing
    layer indices so the 12 per-layer instances of e.g. the FFN forward
    GEMM aggregate into one row. Direction prefix: fwd (jvp), bwd
    (transpose(jvp)), or opt for optimizer/other ops with no model path."""
    m = _OPNAME_RE.search(rest)
    if not m:
        return "opt/" + re.sub(r"[.\d]+$", "", instr_name)
    path = m.group(1)
    if path.startswith("jit(step_fn)/"):
        path = path[len("jit(step_fn)/"):]
    if path.startswith("transpose(jvp"):
        direction = "bwd"
    elif path.startswith("jvp"):
        direction = "fwd"
    else:
        direction = "opt"
    path = re.sub(r"^[^/]*/", "", path)  # drop the jvp(...) wrapper segment
    path = re.sub(r"layer_\d+", "layer_*", path)
    path = re.sub(r"/\d+$", "", path)
    # keep the tail segments that identify the op (module path + primitive)
    segs = path.split("/")
    return direction + " " + "/".join(segs[-4:])


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


def conv_flops(shape_str, rest, table):
    """FLOPs of one convolution (XLA:TPU lowers every matmul to conv).

    2 * prod(output dims) * K.  K = rhs input-feature dims times, per
    spatial dim, the average number of VALID taps per output position.
    XLA encodes matmuls as convs three ways: (a) plain 1x1 convs (taps=1),
    (b) dW matmuls where the contraction over positions is a full-width
    window over lhs spatial (taps=L), and (c) batched matmuls via
    lhs_dilate+stride, where each output sees exactly one real tap.  For
    stride-1 windows the identity `valid (input,kernel) pairs per spatial
    dim = L * min(w, O)` covers (a) and (b) including the padded forms
    (L=1, w=S, pad S-1: one valid tap per output)."""
    _, out_dims = shape_elems(shape_str)
    dl = re.search(r"dim_labels=(\w+)_(\w+)->(\w+)", rest)
    if dl is None:
        return 0
    lhs_label, rhs_label, out_label = dl.groups()
    ops = re.findall(r"%([\w.-]+)", rest.split("),")[0])
    refs = [o for o in ops if o in table]
    if len(refs) < 2:
        return 0
    _, lhs_dims = shape_elems(table[refs[0]][0])
    _, rhs_dims = shape_elems(table[refs[1]][0])
    k = 1.0
    for i, ch in enumerate(rhs_label):
        if ch == "i" and i < len(rhs_dims):
            k *= rhs_dims[i]
    wm = re.search(r"window=\{size=([\dx]+)", rest)
    wsizes = [int(w) for w in wm.group(1).split("x")] if wm else []
    if "lhs_dilate" not in rest:
        for ch in sorted(set(c for c in lhs_label if c.isdigit())):
            li = lhs_label.index(ch)
            L = lhs_dims[li] if li < len(lhs_dims) else 1
            oi = out_label.find(ch)
            O = out_dims[oi] if 0 <= oi < len(out_dims) else 1
            w = wsizes[int(ch)] if int(ch) < len(wsizes) else 1
            k *= L * min(w, O) / O
    out = 1
    for d in out_dims:
        out *= d
    return int(2 * out * k)


def analyze(hlo_text: str):
    """Per-instruction {name: {flops, bytes, op, group}} from optimized HLO.

    Instruction names are unique module-wide, so all computations are merged
    into one table (profiler op names can live in the entry computation OR
    in a wrapped main/while-body computation); operand refs resolve within
    the instruction's own computation."""
    comps = parse_hlo(hlo_text)

    def instr_flops(ishape, iop, irest, itable):
        if iop == "dot":
            return dot_flops(ishape, irest, itable)
        if iop == "convolution":
            return conv_flops(ishape, irest, itable)
        return 0

    def hbm_bytes(shape_str):
        # S(1) marks memory_space=1 (VMEM-resident): no HBM traffic
        return 0 if "S(1)" in shape_str else shape_bytes(shape_str)

    info = {}
    for table in comps.values():
        for name, (shape, op, rest) in table.items():
            bytes_ = hbm_bytes(shape)
            flops = instr_flops(shape, op, rest, table)
            if op in ("fusion", "dot", "convolution", "copy", "copy-start",
                      "bitcast", "get-tuple-element", "custom-call"):
                # operand bytes: resolve %refs in this computation
                for ref in re.findall(r"%([\w.-]+)", rest):
                    if ref in table:
                        bytes_ += hbm_bytes(table[ref][0])
            if op == "fusion":
                cm = re.search(r"calls=%?([\w.-]+)", rest)
                if cm and cm.group(1) in comps:
                    inner = comps[cm.group(1)]
                    for iname, (ishape, iop, irest) in inner.items():
                        flops += instr_flops(ishape, iop, irest, inner)
            info[name] = {
                "flops": flops, "bytes": bytes_, "op": op,
                "group": logical_group(rest, name),
            }
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
    p.add_argument("--hlo_dump", default="/tmp/vilbert_step.hlo",
                   help="where to save the optimized HLO text")
    p.add_argument("--skip_run", action="store_true",
                   help="reuse --hlo_dump and the latest trace under --out "
                        "instead of recompiling/re-profiling")
    args = p.parse_args()

    if args.skip_run:
        with open(args.hlo_dump) as f:
            hlo_text = f.read()
        info = analyze(hlo_text)
        print(f"parsed HLO: {len(info)} instructions, "
              f"{sum(1 for v in info.values() if v['op'] == 'fusion')} fusions")
        times = profile_times(args.out, args.steps)
        report(info, times, args)
        return

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
    with open(args.hlo_dump, "w") as f:
        f.write(hlo_text)
    info = analyze(hlo_text)
    print(f"parsed HLO: {len(info)} instructions, "
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
    report(info, times, args)


def report(info, times, args):
    """Aggregate profiler time by logical op family and print the roofline.

    The per-instruction roofline bound max(FLOPs/peak, bytes/BW) is summed
    within each family; `%roof` = bound/achieved (100% = at the roofline).
    Caveat: per-op achieved times from the profiler exclude DMA that XLA
    overlapped across ops, so HBM-bound rows can report >100%; the
    trustworthy statement is the family-level ordering plus the whole-step
    MFU, both of which this prints."""
    peak_flops = args.peak_tflops * 1e12
    hbm = args.hbm_gbs * 1e9
    groups = collections.defaultdict(
        lambda: {"ms": 0.0, "flops": 0, "bytes": 0, "bound_ms": 0.0, "n": 0})
    unmatched_ms = 0.0
    for name, ms in times.items():
        meta = info.get(name)
        if meta is None:
            unmatched_ms += ms
            continue
        g = groups[meta["group"]]
        g["ms"] += ms
        g["flops"] += meta["flops"]
        g["bytes"] += meta["bytes"]
        g["bound_ms"] += max(
            meta["flops"] / peak_flops, meta["bytes"] / hbm) * 1e3
        g["n"] += 1

    rows = []
    for name, g in groups.items():
        t_mxu = g["flops"] / peak_flops * 1e3
        t_hbm = g["bytes"] / hbm * 1e3
        rows.append({
            "group": name, "n": g["n"], "ms": g["ms"],
            "gflops": g["flops"] / 1e9, "mbytes": g["bytes"] / 1e6,
            "bound_ms": g["bound_ms"],
            "bound_by": "mxu" if t_mxu >= t_hbm else "hbm",
            "pct_of_roof": (g["bound_ms"] / g["ms"] * 100) if g["ms"] else 0,
        })
    rows.sort(key=lambda r: -r["ms"])

    total_ms = sum(r["ms"] for r in rows) + unmatched_ms
    total_flops = sum(r["gflops"] for r in rows) * 1e9
    total_bytes = sum(r["mbytes"] for r in rows) * 1e6
    mfu = total_flops / (total_ms / 1e3) / peak_flops * 100
    hbm_frac = total_bytes / (total_ms / 1e3) / hbm * 100
    print(f"\ndevice busy {total_ms:.1f} ms/step "
          f"({unmatched_ms:.2f} ms unmatched by the HLO parse)")
    print(f"whole step: {total_flops / 1e9:.0f} GFLOP -> {mfu:.1f}% MFU; "
          f"{total_bytes / 1e9:.1f} GB HBM traffic -> {hbm_frac:.0f}% of "
          f"{args.hbm_gbs:.0f} GB/s")
    hdr = (f"{'ms/step':>8} {'bound':>7} {'%roof':>6} {'by':>4} {'#':>4} "
           f"{'GFLOP':>8} {'MB':>9}  group")
    print(hdr)
    for r in rows[: args.top]:
        print(f"{r['ms']:8.3f} {r['bound_ms']:7.3f} {r['pct_of_roof']:5.0f}%"
              f" {r['bound_by']:>4} {r['n']:4d} {r['gflops']:8.1f}"
              f" {r['mbytes']:9.1f}  {r['group'][:70]}")
    covered = sum(r["ms"] for r in rows[: args.top])
    print(f"(top {args.top} groups cover {covered:.1f} ms = "
          f"{covered / total_ms * 100:.0f}% of device time)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "total_ms": total_ms, "unmatched_ms": unmatched_ms,
                "mfu_pct": mfu, "hbm_pct": hbm_frac, "rows": rows,
            }, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
