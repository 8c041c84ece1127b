#!/usr/bin/env python
"""Host-loader scaling evidence (docs/perf.md "~1.5 cores/chip" claim).

This box has ONE CPU core, so k-core scaling can't be measured directly.
What CAN be measured here determines it:

1. the serial loader rate (samples/s/core),
2. the GIL-BOUND fraction of a batch build — the thread-pool builder
   (`ConceptCapLoader(num_workers=k)`) parallelizes at batch granularity
   with THREADS, so its ceiling on a k-core host is
   ``1 / max(gil_fraction, 1/k)`` of ideal (numpy region kernels release
   the GIL; the pure-Python WordPiece tokenize + mask bookkeeping holds it),
3. the thread-pool overhead at num_workers>1 on one core (contention-only
   worst case).

The GIL fraction is measured by running the pure-Python part of `fill`
(tokenize + word masking, the code between numpy calls) standalone against
a full `_build_batch`. Prints one JSON line + a projection table.

Usage: python scripts/loader_scaling.py [--batches 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=256)
    args = p.parse_args()

    import bench
    from vilbert_tpu.data.concap import (
        ConceptCapLoader, ConceptCapSampleConfig,
    )
    from vilbert_tpu.data.tokenization import WordPieceTokenizer

    store, captions, vocab = bench._e2e_artifacts()
    tok = WordPieceTokenizer(vocab)
    cfg = ConceptCapSampleConfig()

    def rate(num_workers: int) -> float:
        from vilbert_tpu.data.prefetch import repeat_iterator

        loader = ConceptCapLoader(
            store, captions, tok, batch_size=args.batch_size, cfg=cfg,
            seed=0, num_workers=num_workers,
        )
        it = repeat_iterator(lambda: iter(loader))
        for _ in range(len(loader) + 1):  # one full epoch: mmap + memo warm
            next(it)
        n = 0
        t0 = time.perf_counter()
        while n < args.batches * args.batch_size:
            n += next(it)["input_ids"].shape[0]
        return n / (time.perf_counter() - t0)

    serial = rate(0)
    threads2 = rate(2)
    threads4 = rate(4)

    # GIL-bound fraction: time ONLY the pure-Python token path of the same
    # samples (tokenize → truncate → mask words → label assembly) vs a full
    # batch build including the numpy region work.
    loader = ConceptCapLoader(
        store, captions, tok, batch_size=args.batch_size, cfg=cfg, seed=0,
    )
    pre = loader.preprocessor
    slices = loader._epoch_slices(0)[: args.batches]
    for s in slices:  # warm the token memo + mmap pages
        loader._build_batch(s, 0)
    t0 = time.perf_counter()
    for s in slices:
        loader._build_batch(s, 0)
    full = (time.perf_counter() - t0) / len(slices)

    t0 = time.perf_counter()
    for s in slices:
        for idx in s:
            key = loader.keys[idx]
            rng = np.random.default_rng((0, 0, int(idx)))
            cap, _ = pre.random_cap(loader.captions[key], rng)
            ids = list(pre.encode_cached(cap))
            pre.random_word(ids, rng)
    tok_only = (time.perf_counter() - t0) / len(slices)
    gil_fraction = tok_only / full

    def projected(cores: int) -> float:
        # batch-granular threads: ideal k× until the GIL-held span saturates
        return serial / max(gil_fraction, 1.0 / cores)

    out = {
        "metric": "cc_loader_samples_per_sec_per_core",
        "serial": round(serial, 1),
        "workers2_1core": round(threads2, 1),
        "workers4_1core": round(threads4, 1),
        "gil_bound_fraction": round(gil_fraction, 3),
        "projected_2core": round(projected(2), 1),
        "projected_4core": round(projected(4), 1),
        "projected_8core": round(projected(8), 1),
        "batch_size": args.batch_size,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
