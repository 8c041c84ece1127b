"""Legacy artifact ingestion: bulk HDF5 and bottom-up-attention TSV → VFR.

Covers the reference's legacy feature formats: the flickr30k-style h5 layout
(datasets image_ids/num_boxes/features/boxes, reference
script/generate_pool.py:56-76) and the base64 TSV shards consumed by
script/convert_h5_refcoco.py.
"""

import base64
import csv
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from vilbert_tpu.data.feature_store import VrfFeatureStore

pytestmark = pytest.mark.slow

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "convert_lmdb_to_vfr.py"


def _run(*argv):
    subprocess.run([sys.executable, str(SCRIPT), *argv], check=True)


def test_from_h5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.RandomState(0)
    n_img, max_boxes, dim = 3, 7, 16
    num_boxes = np.array([7, 4, 6])
    feats = rng.rand(n_img, max_boxes, dim).astype(np.float32)
    boxes = rng.rand(n_img, max_boxes, 4).astype(np.float32) * 100
    src = tmp_path / "legacy.h5"
    with h5py.File(src, "w") as f:
        f["image_ids"] = np.array([b"10", b"11", b"12"])
        f["num_boxes"] = num_boxes
        f["features"] = feats
        f["boxes"] = boxes
        f["image_h"] = np.array([480, 320, 240])
        f["image_w"] = np.array([640, 320, 360])

    dst = tmp_path / "legacy.vfr"
    _run("--src", str(src), "--dst", str(dst), "--from_h5",
         "--feature_dim", str(dim))

    store = VrfFeatureStore(str(dst))
    assert sorted(store.keys()) == ["10", "11", "12"]
    rf = store.get("11")
    assert rf.features.shape == (4, dim)
    np.testing.assert_allclose(rf.features, feats[1, :4])
    np.testing.assert_allclose(rf.boxes, boxes[1, :4])
    assert (rf.image_h, rf.image_w) == (320, 320)


def test_from_tsv_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    dim, tdim = 16, 9
    src = tmp_path / "feats.tsv.0"
    rows = {}
    with open(src, "w", newline="") as f:
        writer = csv.writer(f, delimiter="\t")
        for image_id in ["100", "101"]:
            n = int(rng.randint(3, 6))
            feats = rng.rand(n, dim).astype(np.float32)
            boxes = (rng.rand(n, 4) * 50).astype(np.float32)
            target = rng.rand(n, tdim).astype(np.float32)
            rows[image_id] = (feats, boxes, target)
            writer.writerow([
                image_id, 640, 480, n,
                base64.b64encode(boxes.tobytes()).decode(),
                base64.b64encode(feats.tobytes()).decode(),
                base64.b64encode(target.tobytes()).decode(),
            ])

    dst = tmp_path / "feats.vfr"
    _run("--src", str(src), "--dst", str(dst), "--from_tsv",
         "--feature_dim", str(dim), "--target_dim", str(tdim))

    store = VrfFeatureStore(str(dst))
    assert sorted(store.keys()) == ["100", "101"]
    for image_id, (feats, boxes, target) in rows.items():
        rf = store.get(image_id)
        np.testing.assert_allclose(rf.features, feats)
        np.testing.assert_allclose(rf.boxes, boxes)
        np.testing.assert_allclose(rf.target, target)
        assert (rf.image_h, rf.image_w) == (480, 640)
