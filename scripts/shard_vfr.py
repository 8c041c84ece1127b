#!/usr/bin/env python
"""Split a VFR feature store into N host shards.

Equivalent of the reference script/preprocess_sequential_train_segment.py
(per-rank CC LMDB shards, concept_cap_dataset.py:198-207). On TPU, host
sharding can also be done logically via ConceptCapLoader(shard_id,
num_shards); physical shards help when hosts have independent disks.

Usage:
  python scripts/shard_vfr.py --src cc_train.vfr --num_shards 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--num_shards", type=int, required=True)
    p.add_argument("--out_prefix", default="")
    args = p.parse_args()

    from vilbert_tpu.data.feature_store import VrfFeatureStore, VrfWriter

    store = VrfFeatureStore(args.src)
    prefix = args.out_prefix or os.path.splitext(args.src)[0]
    keys = store.keys()
    for shard in range(args.num_shards):
        path = f"{prefix}_part_{shard}.vfr"
        with VrfWriter(path, feature_dim=store.feature_dim,
                       target_dim=store.target_dim) as w:
            for key in keys[shard :: args.num_shards]:
                w.add(key, store.get(key))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
