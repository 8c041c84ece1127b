"""Annotation-format loaders against small files in the reference layouts."""

import json
import os
import pickle

import numpy as np
import pytest

from vilbert_tpu.data import annotations as ann


def test_load_vqa(tmp_path):
    root = tmp_path
    qs = {
        "questions": [
            {"question_id": 2, "image_id": 11, "question": "what color?"},
            {"question_id": 1, "image_id": 10, "question": "how many?"},
        ]
    }
    (root / "v2_OpenEnded_mscoco_train2014_questions.json").write_text(
        json.dumps(qs)
    )
    os.makedirs(root / "cache")
    targets = [
        {"question_id": 1, "image_id": 10, "labels": [3], "scores": [1.0]},
        {"question_id": 2, "image_id": 11, "labels": [5, 7], "scores": [0.9, 0.3]},
    ]
    with open(root / "cache" / "train_target.pkl", "wb") as f:
        pickle.dump(targets, f)
    out = ann.load_vqa(str(root), "train")
    assert len(out) == 2
    assert out[0].question_id == 1 and out[0].image_id == "10"
    assert list(out[1].labels) == [5, 7]


def test_load_nlvr2(tmp_path):
    lines = [
        {"identifier": "train-1001-0-0", "sentence": "two dogs", "label": "True"},
        {"identifier": "train-1002-0-0", "sentence": "a cat", "label": "False"},
    ]
    (tmp_path / "train.json").write_text(
        "\n".join(json.dumps(l) for l in lines)
    )
    out = ann.load_nlvr2(str(tmp_path), "train")
    assert out[0].image_id == "train-1001-0-img0"
    assert out[0].image_id_b == "train-1001-0-img1"
    assert out[0].label == 1 and out[1].label == 0


def test_load_snli_ve(tmp_path):
    lines = [
        {"Flikr30kID": "123.jpg", "sentence2": "a person runs",
         "gold_label": "entailment"},
        {"Flikr30kID": "124.jpg", "sentence2": "nothing", "gold_label": "-"},
        {"Flikr30kID": "125.jpg", "sentence2": "a dog", "gold_label": "neutral"},
    ]
    (tmp_path / "snli_ve_train.jsonl").write_text(
        "\n".join(json.dumps(l) for l in lines)
    )
    out = ann.load_snli_ve(str(tmp_path), "train")
    assert len(out) == 2  # '-' skipped
    assert out[0].image_id == "123" and out[0].label == 2


def test_load_retrieval(tmp_path):
    lines = [
        {"id": 7, "sentences": ["cap a", "cap b"]},
        {"id": 8, "sentences": ["cap c"]},
    ]
    p = tmp_path / "ann.jsonline"
    p.write_text("\n".join(json.dumps(l) for l in lines))
    out = ann.load_retrieval(str(p), "RetrievalCOCO")
    assert len(out) == 3
    assert out[0].image_id == "7" and out[2].image_id == "8"


def test_load_vcr(tmp_path):
    rec = {
        "objects": ["person", "person", "car"],
        "question": ["Why", "is", [0], "sad", "?"],
        "answer_choices": [["Because", [1], "left"], ["No", "reason"]],
        "answer_label": 0,
        "rationale_choices": [["He", "cried"], ["She", "left", "with", [2]]],
        "rationale_label": 1,
        "metadata_fn": "vcr1/img123.json",
    }
    p = tmp_path / "train.jsonl"
    p.write_text(json.dumps(rec))
    qa = ann.load_vcr(str(p), mode="QA")
    assert len(qa) == 1
    assert "Casey" in qa[0].text  # [0] -> neutral name
    assert len(qa[0].options) == 2 and qa[0].label == 0
    qar = ann.load_vcr(str(p), mode="QAR")
    assert qar[0].text_b  # right answer attached
    assert "car" in qar[0].options[1]
    assert qar[0].label == 1


def test_load_guesswhat(tmp_path):
    rec = {
        "id": 1, "image": {"id": 99},
        "qas": [{"question": "is it red?", "answer": "Yes"},
                {"question": "left side?", "answer": "N/A"}],
        "status": "success",
    }
    p = tmp_path / "gw.jsonl"
    p.write_text(json.dumps(rec))
    out = ann.load_guesswhat(str(p))
    assert len(out) == 2
    assert out[0].label == 0 and out[1].label == 2
    assert out[0].image_id == "99"


def test_load_refer(tmp_path):
    d = tmp_path / "refcoco+"
    os.makedirs(d)
    refs = [
        {"ref_id": 1, "ann_id": 5, "image_id": 42, "split": "train",
         "sentences": [{"sent": "left dog"}, {"sent": "the dog on the left"}]},
        {"ref_id": 2, "ann_id": 6, "image_id": 43, "split": "val",
         "sentences": [{"sent": "red car"}]},
    ]
    with open(d / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    inst = {"annotations": [
        {"id": 5, "bbox": [10, 20, 30, 40]},
        {"id": 6, "bbox": [0, 0, 5, 5]},
    ]}
    (d / "instances.json").write_text(json.dumps(inst))
    out = ann.load_refer(str(tmp_path), "refcoco+", "train")
    assert len(out) == 2  # two sentences of ref 1
    np.testing.assert_array_equal(out[0].ref_box, [10, 20, 40, 60])
