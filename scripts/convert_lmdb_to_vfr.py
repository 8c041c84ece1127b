#!/usr/bin/env python
"""Convert a reference LMDB feature store to our mmap-able VFR format.

Equivalent of reading the artifact produced by the reference
script/convert_to_lmdb.py (value schema {image_id, image_h, image_w,
num_boxes, boxes, features}); requires the `lmdb` package only here, never in
the training path.

Also converts a directory of .npy/.npz per-image feature files (the
reference extractor's raw output, script/extract_features.py) directly.

Usage:
  python scripts/convert_lmdb_to_vfr.py --src features.lmdb --dst features.vfr
  python scripts/convert_lmdb_to_vfr.py --src npy_dir/ --dst features.vfr --from_npy
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--from_npy", action="store_true")
    p.add_argument("--feature_dim", type=int, default=2048)
    p.add_argument("--target_dim", type=int, default=1601)
    args = p.parse_args()

    from vilbert_tpu.data.feature_store import (
        LmdbFeatureStore, RegionFeatures, VrfWriter,
    )

    with VrfWriter(args.dst, feature_dim=args.feature_dim,
                   target_dim=args.target_dim) as w:
        if args.from_npy:
            for fname in sorted(os.listdir(args.src)):
                if not fname.endswith((".npy", ".npz")):
                    continue
                item = np.load(os.path.join(args.src, fname),
                               allow_pickle=True)
                if hasattr(item, "item"):
                    item = item.item()
                rf = RegionFeatures(
                    features=np.asarray(item["features"], np.float32).reshape(
                        -1, args.feature_dim
                    ),
                    boxes=np.asarray(item["bbox"], np.float32).reshape(-1, 4),
                    image_h=int(item["image_height"]),
                    image_w=int(item["image_width"]),
                    target=item.get("cls_prob"),
                )
                w.add(os.path.splitext(fname)[0], rf)
        else:
            store = LmdbFeatureStore(args.src)
            for key in store.keys():
                w.add(key, store.get(key))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
