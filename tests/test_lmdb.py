"""Pure-Python LMDB reader/writer + the reference-artifact ingestion leg.

The reference ships every feature artifact as LMDB written by the C library
(script/convert_to_lmdb.py:29-48). These tests build a reference-schema
fixture with our LmdbWriter, read it through LmdbFeatureStore (which falls
back to data/lmdb_reader.py when the C package is absent — as in this
image), and run the LMDB->VFR converter end to end.
"""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from vilbert_tpu.data.lmdb_reader import LmdbReader, LmdbWriter

ROOT = Path(__file__).resolve().parents[1]


class TestReaderWriter:
    def test_roundtrip_small_and_big_values(self, tmp_path):
        path = str(tmp_path / "env.lmdb")
        items = {
            b"alpha": b"1" * 10,
            b"beta": os.urandom(5000),       # overflow value
            b"gamma": b"",                    # empty value
            b"keys": pickle.dumps([b"alpha", b"beta", b"gamma"]),
        }
        with LmdbWriter(path) as w:
            for k, v in items.items():
                w.put(k, v)
        with LmdbReader(path) as r:
            assert r.entries == len(items)
            for k, v in items.items():
                assert r.get(k) == v, k
            assert r.get(b"missing") is None
            # in-order iteration over sorted keys
            assert r.keys() == sorted(items)

    def test_many_keys_multi_level_tree(self, tmp_path):
        """Enough keys to force several leaf pages + a branch level."""
        path = str(tmp_path / "big.lmdb")
        rng = np.random.RandomState(0)
        items = {
            f"key_{i:06d}".encode(): rng.bytes(rng.randint(1, 200))
            for i in range(2000)
        }
        with LmdbWriter(path) as w:
            for k, v in items.items():
                w.put(k, v)
        with LmdbReader(path) as r:
            assert r.entries == 2000
            for k in list(items)[::97] + [b"key_000000", b"key_001999"]:
                assert r.get(k) == items[k], k
            assert r.get(b"key_002000") is None
            assert r.get(b"a") is None
            assert r.get(b"zzz") is None
            assert r.keys() == sorted(items)

    @pytest.mark.skipif(
        not pytest.importorskip("importlib").util.find_spec("lmdb"),
        reason="C lmdb not installed",
    )
    def test_c_lmdb_reads_our_files(self, tmp_path):
        """When the real lmdb IS present, it must read LmdbWriter output."""
        import lmdb

        path = str(tmp_path / "compat.lmdb")
        with LmdbWriter(path) as w:
            w.put(b"k1", b"v1")
            w.put(b"big", b"x" * 9000)
        env = lmdb.open(path, readonly=True, lock=False)
        with env.begin() as txn:
            assert txn.get(b"k1") == b"v1"
            assert txn.get(b"big") == b"x" * 9000


def _reference_schema_lmdb(tmp_path, num_images=4, num_boxes=7):
    """Fixture in the exact reference converter schema
    (script/convert_to_lmdb.py:36-48)."""
    rng = np.random.RandomState(1)
    path = str(tmp_path / "features.lmdb")
    id_list = []
    expected = {}
    with LmdbWriter(path) as w:
        for i in range(num_images):
            image_id = str(10000 + i)
            item = {
                "image_id": image_id,
                "image_h": 480,
                "image_w": 640,
                "num_boxes": num_boxes,
                "boxes": rng.rand(num_boxes, 4).astype(np.float32) * 400,
                "features": rng.randn(num_boxes, 2048).astype(np.float32),
            }
            id_list.append(image_id.encode())
            w.put(image_id.encode(), pickle.dumps(item))
            expected[image_id] = item
        w.put(b"keys", pickle.dumps(id_list))
    return path, expected


class TestIngestionLeg:
    def test_feature_store_reads_reference_schema(self, tmp_path):
        from vilbert_tpu.data.feature_store import LmdbFeatureStore

        path, expected = _reference_schema_lmdb(tmp_path)
        store = LmdbFeatureStore(path)
        assert sorted(store.keys()) == sorted(expected)
        for image_id, item in expected.items():
            rf = store.get(image_id)
            np.testing.assert_array_equal(rf.features, item["features"])
            np.testing.assert_array_equal(rf.boxes, item["boxes"])
            assert (rf.image_h, rf.image_w) == (480, 640)

    def test_lmdb_to_vfr_conversion_byte_identical(self, tmp_path):
        from vilbert_tpu.data.feature_store import (
            LmdbFeatureStore,
            VrfFeatureStore,
        )

        path, expected = _reference_schema_lmdb(tmp_path)
        dst = str(tmp_path / "features.vfr")
        subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "convert_lmdb_to_vfr.py"),
             "--src", path, "--dst", dst],
            check=True, cwd=str(ROOT),
        )
        lm = LmdbFeatureStore(path)
        vf = VrfFeatureStore(dst)
        assert sorted(vf.keys()) == sorted(lm.keys())
        for k in lm.keys():
            a, b = lm.get(k), vf.get(k)
            assert a.features.tobytes() == b.features.tobytes()
            assert a.boxes.tobytes() == b.boxes.tobytes()
            assert (a.image_h, a.image_w) == (b.image_h, b.image_w)
