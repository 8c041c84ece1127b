#!/usr/bin/env python
"""Measure the native C++ VFR reader (native/vfs) against the pure-Python
mmap store on the loader read path (VERDICT r4 item 7).

Builds a VFR store at real CC shapes (36 boxes x 2048 fp32 features + soft
target rows), then times randomized `get(key)` + `read_with_global(...)`
sweeps — the exact per-sample work the dataset loaders do
(vilbert_tpu/data/tasks.py) — through three readers:

  - python: VrfFeatureStore (mmap + numpy frombuffer slices)
  - native: NativeVrfFeatureStore (C++ mmap, zero-copy pointers via ctypes)
  - native+prefetch: same, with the background prefetch pool warming the
    next window of keys (the intended production pattern)

Prints one JSON block; the number goes in docs/data.md next to the
native-reader claim.

Usage: python scripts/bench_vfs.py [--images 2000] [--reads 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BOXES = 36
FDIM = 2048
TDIM = 1601


def build_store(path: str, num_images: int) -> None:
    from vilbert_tpu.data.feature_store import RegionFeatures, VrfWriter

    rng = np.random.RandomState(0)
    with VrfWriter(path, feature_dim=FDIM, target_dim=TDIM) as w:
        for i in range(num_images):
            w.add(
                str(100000 + i),
                RegionFeatures(
                    features=rng.randn(BOXES, FDIM).astype(np.float32),
                    boxes=(rng.rand(BOXES, 4) * 320).astype(np.float32),
                    image_h=480,
                    image_w=640,
                    target=rng.rand(BOXES, TDIM).astype(np.float32),
                ),
            )


def sweep(store, keys, reads: int, *, prefetch: bool = False) -> dict:
    from vilbert_tpu.data.feature_store import read_with_global

    rng = np.random.RandomState(1)
    order = [keys[i] for i in rng.randint(0, len(keys), reads)]
    # warm the page cache identically for every contender
    for k in keys:
        read_with_global(store.get(k))
    t0 = time.perf_counter()
    if prefetch:
        WINDOW = 256
        for w0 in range(0, len(order), WINDOW):
            window = order[w0 : w0 + WINDOW]
            store.prefetch(window)
            for k in window:
                read_with_global(store.get(k))
    else:
        for k in order:
            read_with_global(store.get(k))
    dt = time.perf_counter() - t0
    bytes_per_read = BOXES * (FDIM + TDIM) * 4
    return {
        "reads_per_s": round(reads / dt, 1),
        "mb_per_s": round(reads * bytes_per_read / dt / 1e6, 1),
        "s": round(dt, 2),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=2000)
    p.add_argument("--reads", type=int, default=20000)
    p.add_argument("--dir", default="")
    args = p.parse_args()

    from vilbert_tpu.data import native_vfs
    from vilbert_tpu.data.feature_store import VrfFeatureStore

    out = {"images": args.images, "reads": args.reads,
           "record_mb": round(BOXES * (FDIM + TDIM) * 4 / 1e6, 2)}
    tmp = args.dir or tempfile.mkdtemp(prefix="bench_vfs_")
    path = os.path.join(tmp, "bench.vfr")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        build_store(path, args.images)
        out["build_s"] = round(time.perf_counter() - t0, 1)

    py = VrfFeatureStore(path)
    keys = py.keys()
    out["python_mmap"] = sweep(py, keys, args.reads)

    if native_vfs.native_available():
        ns = native_vfs.NativeVrfFeatureStore(path)
        out["native"] = sweep(ns, keys, args.reads)
        out["native_prefetch"] = sweep(ns, keys, args.reads, prefetch=True)
        ns.close()
        out["native_speedup"] = round(
            out["native"]["reads_per_s"] / out["python_mmap"]["reads_per_s"], 2
        )
    else:
        out["native"] = "unavailable (no toolchain)"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
