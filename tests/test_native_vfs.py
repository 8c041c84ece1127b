"""Native C++ VFR reader vs the Python reader (skipped without a toolchain)."""

import numpy as np
import pytest

from vilbert_tpu.data.feature_store import InMemoryFeatureStore, VrfWriter


@pytest.fixture(scope="module")
def native():
    from vilbert_tpu.data import native_vfs

    if not native_vfs.native_available():
        pytest.skip("native vfs library not buildable here")
    return native_vfs


def test_native_matches_python(native, tmp_path):
    store = InMemoryFeatureStore.synthetic(
        num_images=5, num_boxes=9, feature_dim=16, target_dim=7
    )
    path = str(tmp_path / "n.vfr")
    with VrfWriter(path, feature_dim=16, target_dim=7) as w:
        for k in store.keys():
            w.add(k, store.get(k))
    ns = native.NativeVrfFeatureStore(path)
    assert sorted(ns.keys()) == sorted(store.keys())
    assert ns.feature_dim == 16 and ns.target_dim == 7
    for k in store.keys():
        a, b = store.get(k), ns.get(k)
        np.testing.assert_array_equal(a.features, b.features)
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.target, b.target)
        assert (a.image_h, a.image_w) == (b.image_h, b.image_w)
    ns.prefetch(store.keys())
    with pytest.raises(KeyError):
        ns.get("nope")
    ns.close()


def test_native_no_target(native, tmp_path):
    store = InMemoryFeatureStore.synthetic(
        num_images=3, num_boxes=4, feature_dim=8, target_dim=None
    )
    path = str(tmp_path / "nt.vfr")
    with VrfWriter(path, feature_dim=8, target_dim=5) as w:
        for k in store.keys():
            w.add(k, store.get(k))
    ns = native.NativeVrfFeatureStore(path)
    rf = ns.get("0")
    assert rf.target is None
    np.testing.assert_array_equal(rf.features, store.get("0").features)
    ns.close()
