#!/usr/bin/env python
"""Build the retrieval hard-negative pool.

Equivalent of the reference script/generate_pool.py:34-92: mean region
feature per image -> 100 nearest neighbors (BallTree) -> hard_negative.pkl
consumed by RetrievalDataset (reference retreival_dataset.py:97-107).

Usage:
  python scripts/generate_hard_negatives.py --store train.vfr \\
      --out hard_negative.pkl --num_neighbors 100
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_neighbors", type=int, default=100)
    args = p.parse_args()

    from sklearn.neighbors import BallTree

    from vilbert_tpu.data.feature_store import open_feature_store

    store = open_feature_store(args.store)
    keys = store.keys()
    means = np.stack(
        [store.get(k).features.mean(axis=0) for k in keys]
    )
    tree = BallTree(means)
    k = min(args.num_neighbors + 1, len(keys))
    _, idx = tree.query(means, k=k)
    pool = {
        key: [keys[j] for j in row if keys[j] != key][: args.num_neighbors]
        for key, row in zip(keys, idx)
    }
    with open(args.out, "wb") as f:
        pickle.dump(pool, f)
    print(f"wrote {args.out} ({len(pool)} images, {k - 1} neighbors each)")


if __name__ == "__main__":
    main()
