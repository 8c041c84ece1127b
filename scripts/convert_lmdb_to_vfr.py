#!/usr/bin/env python
"""Convert a reference LMDB feature store to our mmap-able VFR format.

Equivalent of reading the artifact produced by the reference
script/convert_to_lmdb.py (value schema {image_id, image_h, image_w,
num_boxes, boxes, features}); requires the `lmdb` package only here, never in
the training path.

Also converts:
- a directory of .npy/.npz per-image feature files (the reference
  extractor's raw output, script/extract_features.py): ``--from_npy``
- the legacy bulk HDF5 layout (datasets image_ids/num_boxes/features/boxes
  [+image_h/image_w], reference _image_features_reader.py:25,46 and
  script/generate_pool.py:56-76): ``--from_h5``
- bottom-up-attention TSV shards with base64-encoded features/boxes
  (reference script/convert_h5_refcoco.py FIELDNAMES): ``--from_tsv``

Usage:
  python scripts/convert_lmdb_to_vfr.py --src features.lmdb --dst features.vfr
  python scripts/convert_lmdb_to_vfr.py --src npy_dir/ --dst features.vfr --from_npy
  python scripts/convert_lmdb_to_vfr.py --src flickr30k.h5 --dst f30k.vfr --from_h5
  python scripts/convert_lmdb_to_vfr.py --src feats.tsv.0 --dst out.vfr --from_tsv
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
    p.add_argument("--from_h5", action="store_true")
    p.add_argument("--from_tsv", action="store_true")
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
        elif args.from_h5:
            import h5py

            with h5py.File(args.src, "r") as f:
                ids = f["image_ids"][:]
                num_boxes = f["num_boxes"][:]
                for i, image_id in enumerate(ids):
                    n = int(num_boxes[i])
                    feats = np.asarray(
                        f["features"][i], np.float32
                    ).reshape(-1, args.feature_dim)[:n]
                    boxes = np.asarray(f["boxes"][i], np.float32).reshape(
                        -1, 4
                    )[:n]
                    # legacy files without size datasets: boxes are already
                    # pixel coords; fall back to their extent
                    if "image_h" in f:
                        h_, w_ = int(f["image_h"][i]), int(f["image_w"][i])
                    else:
                        h_ = int(np.ceil(boxes[:, 3].max())) if n else 1
                        w_ = int(np.ceil(boxes[:, 2].max())) if n else 1
                    key = image_id.decode() if isinstance(
                        image_id, bytes
                    ) else str(image_id)
                    w.add(key, RegionFeatures(
                        features=feats, boxes=boxes, image_h=h_, image_w=w_,
                    ))
        elif args.from_tsv:
            import base64
            import csv

            csv.field_size_limit(sys.maxsize)
            fields = ["image_id", "image_w", "image_h", "num_boxes",
                      "boxes", "features", "cls_prob"]
            with open(args.src) as tsv:
                for item in csv.DictReader(
                    tsv, delimiter="\t", fieldnames=fields
                ):
                    n = int(item["num_boxes"])
                    feats = np.frombuffer(
                        base64.b64decode(item["features"]), np.float32
                    ).reshape(n, args.feature_dim).copy()
                    boxes = np.frombuffer(
                        base64.b64decode(item["boxes"]), np.float32
                    ).reshape(n, 4).copy()
                    target = None
                    if item.get("cls_prob"):
                        target = np.frombuffer(
                            base64.b64decode(item["cls_prob"]), np.float32
                        ).reshape(n, -1).copy()
                        if target.shape[1] != args.target_dim:
                            target = None
                    w.add(str(item["image_id"]), RegionFeatures(
                        features=feats, boxes=boxes,
                        image_h=int(item["image_h"]),
                        image_w=int(item["image_w"]), target=target,
                    ))
        else:
            store = LmdbFeatureStore(args.src)
            for key in store.keys():
                w.add(key, store.get(key))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
