"""Data-layer tests: boxes, feature stores, CC pipeline."""

import numpy as np
import pytest

from vilbert_tpu.data.boxes import iou, normalize_locations
from vilbert_tpu.data.concap import (
    ConceptCapLoader,
    ConceptCapPreprocessor,
    ConceptCapSampleConfig,
    collate_concap,
)
from vilbert_tpu.data.feature_store import (
    InMemoryFeatureStore,
    RegionFeatures,
    VrfFeatureStore,
    VrfWriter,
    read_with_global,
)
from vilbert_tpu.data.tokenization import HashTokenizer


def brute_force_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, bo in enumerate(a):
        for j, bb in enumerate(b):
            ax = (bo[2] - bo[0] + 1) * (bo[3] - bo[1] + 1)
            bx = (bb[2] - bb[0] + 1) * (bb[3] - bb[1] + 1)
            iw = min(bo[2], bb[2]) - max(bo[0], bb[0]) + 1
            ih = min(bo[3], bb[3]) - max(bo[1], bb[1]) + 1
            inter = max(iw, 0) * max(ih, 0)
            out[i, j] = inter / (ax + bx - inter)
    return out


def test_iou_matches_bruteforce(rng_np):
    x1 = rng_np.uniform(0, 50, (8,))
    y1 = rng_np.uniform(0, 50, (8,))
    a = np.stack([x1, y1, x1 + rng_np.uniform(1, 60, 8), y1 + rng_np.uniform(1, 60, 8)], 1)
    np.testing.assert_allclose(iou(a, a), brute_force_iou(a, a), rtol=1e-5)
    assert np.allclose(np.diag(iou(a, a)), 1.0)


def test_vrf_roundtrip(tmp_path, rng_np):
    store = InMemoryFeatureStore.synthetic(num_images=5, num_boxes=7,
                                           feature_dim=32, target_dim=11)
    path = str(tmp_path / "test.vfr")
    with VrfWriter(path, feature_dim=32, target_dim=11) as w:
        for k in store.keys():
            w.add(k, store.get(k))
    reader = VrfFeatureStore(path)
    assert sorted(reader.keys()) == sorted(store.keys())
    for k in store.keys():
        a, b = store.get(k), reader.get(k)
        np.testing.assert_array_equal(a.features, b.features)
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.target, b.target)
        assert (a.image_h, a.image_w) == (b.image_h, b.image_w)
    reader.close()


def test_read_with_global():
    feats = np.arange(12, dtype=np.float32).reshape(3, 4)
    boxes = np.array([[0, 0, 320, 240], [10, 10, 100, 100], [0, 0, 640, 480]],
                     np.float32)
    rf = RegionFeatures(feats, boxes, image_h=480, image_w=640)
    out = read_with_global(rf)
    assert out.num_boxes == 4
    np.testing.assert_allclose(out.features[0], feats.mean(0), rtol=1e-6)
    np.testing.assert_array_equal(out.locations[0], [0, 0, 1, 1, 1])
    # third box covers the full image -> area fraction 1
    np.testing.assert_allclose(out.locations[3], [0, 0, 1, 1, 1], atol=1e-6)
    np.testing.assert_array_equal(out.locations_ori[0], [0, 0, 640, 480, 640 * 480])


class TestConcapPipeline:
    @pytest.fixture()
    def pipeline(self):
        tok = HashTokenizer(vocab_size=200)
        store = InMemoryFeatureStore.synthetic(
            num_images=24, num_boxes=9, feature_dim=16, target_dim=7
        )
        captions = {k: f"a photo of thing number {k} with stuff" for k in store.keys()}
        cfg = ConceptCapSampleConfig(
            seq_len=12, region_len=9, feature_dim=16, target_dim=7
        )
        return tok, store, captions, cfg

    def test_sample_shapes_and_masking(self, pipeline):
        tok, store, captions, cfg = pipeline
        pre = ConceptCapPreprocessor(tok, list(captions.values()), cfg)
        rng = np.random.default_rng(0)
        s = pre(store.get("0"), captions["0"], rng)
        assert s["input_ids"].shape == (12,)
        assert s["image_feat"].shape == (9, 16)
        assert s["image_target"].shape == (9, 7)
        assert s["input_ids"][0] == tok.cls_token_id
        # lm labels only at masked positions, never at CLS/SEP/pad
        assert s["lm_label_ids"][0] == -1
        assert set(np.unique(s["image_label"])) <= {-1, 1}

    def test_masking_statistics(self, pipeline):
        """~15% of tokens masked, 50% caption swap over many samples."""
        tok, store, captions, cfg = pipeline
        pre = ConceptCapPreprocessor(tok, list(captions.values()), cfg)
        n_tok = n_masked = n_swap = n_samples = 0
        for i in range(400):
            rng = np.random.default_rng(i)
            key = str(i % 24)
            s = pre(store.get(key), captions[key], rng)
            valid = s["input_mask"].sum() - 2
            n_tok += valid
            n_masked += (s["lm_label_ids"] != -1).sum()
            n_swap += int(s["is_next"])
            n_samples += 1
        assert 0.10 < n_masked / n_tok < 0.20
        assert 0.4 < n_swap / n_samples < 0.6

    def test_collate_global_feature(self, pipeline):
        tok, store, captions, cfg = pipeline
        pre = ConceptCapPreprocessor(tok, list(captions.values()), cfg)
        samples = [
            pre(store.get(str(i)), captions[str(i)], np.random.default_rng(i))
            for i in range(4)
        ]
        batch = collate_concap(samples)
        assert batch["image_feat"].shape == (4, 10, 16)
        assert batch["image_loc"].shape == (4, 10, 5)
        assert batch["image_mask"].shape == (4, 10)
        assert (batch["image_mask"][:, 0] == 1).all()
        np.testing.assert_array_equal(batch["image_loc"][:, 0], [[0, 0, 1, 1, 1]] * 4)
        # global row = sum(feats)/count(not co-masked)
        s0 = samples[0]
        denom = max((~s0["masked_label"]).sum(), 1)
        np.testing.assert_allclose(
            batch["image_feat"][0, 0], s0["image_feat"].sum(0) / denom, rtol=1e-5
        )

    def test_loader_determinism_and_sharding(self, pipeline):
        tok, store, captions, cfg = pipeline
        mk = lambda shard, n: ConceptCapLoader(
            store, captions, tok, batch_size=4, cfg=cfg, seed=7,
            shard_id=shard, num_shards=n,
        )
        b1 = next(iter(mk(0, 1)))
        b2 = next(iter(mk(0, 1)))
        np.testing.assert_array_equal(b1["input_ids"], b2["input_ids"])
        np.testing.assert_array_equal(b1["image_feat"], b2["image_feat"])
        # two shards see disjoint halves
        l0, l1 = mk(0, 2), mk(1, 2)
        assert len(set(l0.keys) & set(l1.keys)) == 0
        assert len(l0.keys) + len(l1.keys) == 24
