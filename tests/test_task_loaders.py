"""Real-format annotation loaders for the last three tasks (round-1 gap):
Visual7w pointing (TASK4), GuessWhatPointing (TASK17), FlickrGrounding
(TASK18). Miniature fixture files follow the reference artifact formats
byte-for-byte; assertions pin the mc/target semantics of
visual7w_pointing_dataset.py:263-268, guesswhat_pointing_dataset.py:247-306
and flickr_grounding_dataset.py:253-299.
"""

import json
import os
import pickle

import numpy as np
import pytest

from vilbert_tpu.data import annotations as ann
from vilbert_tpu.data.annotations import (
    load_flickr_grounding,
    load_guesswhat_pointing,
    load_visual7w_pointing,
)
from vilbert_tpu.data.feature_store import InMemoryFeatureStore, RegionFeatures
from vilbert_tpu.data.tasks import DataLoader, PointingDataset
from vilbert_tpu.data.tokenization import HashTokenizer

W, H = 640, 480

# disjoint pixel boxes, id -> xyxy
V7W_BOXES = {
    10: [0, 0, 50, 50],
    11: [100, 100, 160, 160],
    12: [200, 200, 260, 260],
    13: [300, 300, 360, 360],
    20: [400, 400, 460, 460],
}


def region_features(box_list, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.asarray(box_list, np.float32)
    return RegionFeatures(
        features=rng.randn(len(box_list), dim).astype(np.float32),
        boxes=boxes, image_h=H, image_w=W,
    )


@pytest.fixture()
def v7w_root(tmp_path):
    data = {
        "boxes": [
            {"box_id": i, "x": b[0], "y": b[1],
             "width": b[2] - b[0], "height": b[3] - b[1]}
            for i, b in V7W_BOXES.items()
        ],
        "images": [
            {
                "image_id": 1, "split": "train",
                "qa_pairs": [
                    {"qa_id": 101, "question": "Which is the dog?",
                     "multiple_choices": [11, 12, 13], "answer": 10},
                    {"qa_id": 102, "question": "Which is the cat?",
                     "multiple_choices": [10, 11, 12], "answer": 13},
                ],
            },
            {
                "image_id": 2, "split": "val",
                "qa_pairs": [
                    {"qa_id": 201, "question": "Which is the horse?",
                     "multiple_choices": [10, 11, 20], "answer": 12},
                ],
            },
        ],
    }
    root = tmp_path / "v7w"
    root.mkdir()
    (root / "dataset_v7w_pointing.json").write_text(json.dumps(data))
    return str(root)


class TestVisual7w:
    def test_mc_idx_and_refbox(self, v7w_root):
        out = load_visual7w_pointing(v7w_root, "train")
        assert [a.question_id for a in out] == [101, 102]
        a0 = out[0]
        assert a0.image_id == "v7w_1"
        # per-image option pool = sorted({11,12,13,10}) = [10,11,12,13];
        # qa 101 options sorted([11,12,13,10]) -> indices [0,1,2,3]
        np.testing.assert_array_equal(a0.mc_idx, [0, 1, 2, 3])
        np.testing.assert_allclose(a0.ref_box, V7W_BOXES[10])
        # image 2 pool = sorted({10,11,20,12}) = [10,11,12,20]
        val = load_visual7w_pointing(v7w_root, "val")
        np.testing.assert_array_equal(val[0].mc_idx, [0, 1, 2, 3])
        np.testing.assert_allclose(val[0].ref_box, V7W_BOXES[12])

    def test_clean_datasets_drops_genome_test_images(self, v7w_root):
        os.makedirs(os.path.join(v7w_root, "cache"))
        np.save(os.path.join(v7w_root, "cache", "genome_test_ids.npy"),
                np.array([1]))
        assert load_visual7w_pointing(v7w_root, "train") == []
        # mteval keeps ONLY the test-pool images, reading the train split
        mteval = load_visual7w_pointing(v7w_root, "mteval")
        assert [a.question_id for a in mteval] == [101, 102]

    def test_pointing_dataset_target_at_gt_rows(self, v7w_root):
        anns = load_visual7w_pointing(v7w_root, "train")
        det = InMemoryFeatureStore(
            {"v7w_1": region_features([[0, 0, 639, 479], [5, 5, 100, 100]])}
        )
        # GT store rows follow the per-image sorted pool [10,11,12,13]
        gt = InMemoryFeatureStore(
            {"v7w_1": region_features([V7W_BOXES[i] for i in (10, 11, 12, 13)])}
        )
        R = 108
        ds = PointingDataset(
            anns, det, HashTokenizer(64), max_seq_length=10, max_region_num=R,
            store_gt=gt,
        )
        item = ds[0]  # answer box 10 = pool idx 0 -> mixed row 101
        np.testing.assert_array_equal(item["multiple_choice_ids"], [0, 1, 2, 3])
        np.testing.assert_allclose(item["target"][:, 0], [1, 0, 0, 0])
        # GT features sit at rows 101.. and are mask-visible
        assert item["image_mask"][101:105].tolist() == [1, 1, 1, 1]
        assert item["image_mask"][3] == 0  # detector block zero-padded
        item2 = ds[1]  # answer box 13 = pool idx 3
        np.testing.assert_allclose(item2["target"][:, 0], [0, 0, 0, 1])
        # batches collate (fixed option width)
        batch = next(iter(DataLoader(ds, 2, shuffle=False)))
        assert batch["multiple_choice_ids"].shape == (2, 4)
        assert batch["target"].shape == (2, 4, 1)


@pytest.fixture()
def gw_root(tmp_path):
    root = tmp_path / "gw"
    (root / "cache").mkdir(parents=True)
    with open(root / "cache" / "image_bbox_list.pkl", "wb") as f:
        pickle.dump({123: {"bboxes": [7, 3, 9]}}, f)
    with open(root / "cache" / "bboxes_dict.pkl", "wb") as f:
        pickle.dump({3: [0, 0, 50, 50], 7: [100, 100, 160, 160],
                     9: [200, 200, 260, 260]}, f)
    game = {
        "id": 555, "status": "success",
        "image": {"id": 123},
        "object_id": 7,
        "objects": [{"id": 7}, {"id": 3}],
        "qas": [{"question": "is it red ?", "answer": "Yes"},
                {"question": "is it big ?", "answer": "No"}],
    }
    with open(root / "guesswhat.train.jsonl", "w") as f:
        f.write(json.dumps(game) + "\n")
    return str(root)


class TestGuessWhatPointing:
    def test_loader(self, gw_root):
        out = load_guesswhat_pointing(gw_root, "train")
        assert len(out) == 1
        a = out[0]
        assert a.question_id == 555 and a.image_id == "123"
        # dialogue flattened with start/answer/stop markers
        assert a.text == ("start is it red ? answer Yes stop "
                          "start is it big ? answer No stop ")
        # pool = sorted({7,3,9}) = [3,7,9]; objects sorted by id [3,7] -> [0,1]
        np.testing.assert_array_equal(a.mc_idx, [0, 1])
        np.testing.assert_allclose(a.ref_box, [100, 100, 160, 160])

    def test_dataset_pads_options_to_204(self, gw_root):
        anns = load_guesswhat_pointing(gw_root, "train")
        det = InMemoryFeatureStore(
            {"123": region_features([[0, 0, 639, 479], [5, 5, 100, 100]])}
        )
        gt = InMemoryFeatureStore(
            {"123": region_features(
                [[0, 0, 50, 50], [100, 100, 160, 160], [200, 200, 260, 260]]
            )}
        )
        ds = PointingDataset(
            anns, det, HashTokenizer(64), max_seq_length=16,
            max_region_num=306, store_gt=gt, num_options=204,
        )
        item = ds[0]
        mc = item["multiple_choice_ids"]
        assert mc.shape == (204,)
        # real options then the reference's pad row 204 (an all-zero row)
        np.testing.assert_array_equal(mc[:2], [0, 1])
        assert (mc[2:] == 204).all()
        # ref object 7 = pool idx 1 -> target 1 at option 1, 0 elsewhere
        assert item["target"][1, 0] == 1.0
        assert item["target"].sum() == 1.0


@pytest.fixture()
def flickr_root(tmp_path):
    root = tmp_path / "flickr"
    (root / "Annotations").mkdir(parents=True)
    (root / "Sentences").mkdir()
    (root / "train.txt").write_text("1000\n")
    (root / "Sentences" / "1000.txt").write_text(
        "[/EN#283/people A man] rides [/EN#284/animals a horse] .\n"
        "[/EN#283/people The rider] sits .\n"
    )
    # 1-based corners in the xml; loader subtracts 1
    (root / "Annotations" / "1000.xml").write_text(
        "<annotation><size><width>640</width><height>480</height></size>"
        "<object><name>283</name><bndbox><xmin>11</xmin><ymin>21</ymin>"
        "<xmax>101</xmax><ymax>201</ymax></bndbox></object>"
        "<object><name>284</name><bndbox><xmin>301</xmin><ymin>41</ymin>"
        "<xmax>501</xmax><ymax>301</ymax></bndbox></object>"
        "<object><name>999</name><nobndbox>1</nobndbox>"
        "<scene>0</scene></object>"
        "</annotation>"
    )
    return str(root)


class TestFlickrGrounding:
    def test_loader(self, flickr_root):
        out = load_flickr_grounding(flickr_root, "train")
        # 3 phrases with boxes across 2 sentences (999 has no box)
        assert len(out) == 3
        by_text = {a.text: a for a in out}
        assert set(by_text) == {"A man", "a horse", "The rider"}
        np.testing.assert_allclose(by_text["A man"].ref_box,
                                   [10, 20, 100, 200])
        np.testing.assert_allclose(by_text["a horse"].ref_box,
                                   [300, 40, 500, 300])
        assert by_text["A man"].image_id == "1000"

    def test_clean_datasets(self, flickr_root):
        os.makedirs(os.path.join(flickr_root, "cache"))
        np.save(os.path.join(flickr_root, "cache", "flickr_test_ids.npy"),
                np.array([1000]))
        assert load_flickr_grounding(flickr_root, "train") == []
