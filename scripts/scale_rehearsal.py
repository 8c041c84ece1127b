#!/usr/bin/env python
"""Scale rehearsal of the reference-artifact path (VERDICT r3 item 5).

Builds a ~5-10k-image world in the EXACT published artifact formats
(reference script/convert_to_lmdb.py pickle schema inside LMDB, VQA v2
question json + cache target/label2ans pkls, COCO retrieval jsonlines,
WordPiece vocab.txt), then drives the full user pipeline off it:

  1. write features.lmdb with the first-party pure-Python LmdbWriter
  2. scripts/convert_lmdb_to_vfr.py  (lmdb -> VFR, timed)
  3. loader-only rate of the VQA dataset (timed, no device)
  4. cli.train_tasks --tasks 1 (one epoch, timed)
  5. cli.eval_tasks --split minval (timed)
  6. cli.eval_retrieval --annotations (5-captions protocol, timed)

Every stage prints a measured rate; the final JSON block is the evidence
table for docs/data.md. Labels are a deterministic function of the image
features AND the question text (the question names its answer word), so a
single epoch demonstrably moves the eval score above chance — this is a
pipeline rehearsal, not a claim about synthetic-data accuracy.

Usage:
  python scripts/scale_rehearsal.py --root /tmp/rehearsal --num_images 6000
  python scripts/scale_rehearsal.py --root /tmp/rehearsal --run   # + pipeline
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NUM_ANSWERS = 16       # distinct answers actually used (label space stays 3129)
QS_PER_IMAGE = 2
MINVAL_QS = 512
BOXES = 36
FDIM = 2048


def _questions(rng, image_ids, labels, start_qid):
    """VQA v2 question/target records whose answer is recoverable from the
    text (the question names word<label>) — learnable in one epoch."""
    qs, targets = [], []
    qid = start_qid
    for image_id, label in zip(image_ids, labels):
        filler = " ".join(f"word{rng.randint(200, 999)}"
                          for _ in range(int(rng.randint(4, 9))))
        qs.append({
            "question_id": qid, "image_id": int(image_id),
            "question": f"what is word{label} {filler} ?",
        })
        targets.append({
            "question_id": qid, "image_id": int(image_id),
            "labels": [int(label)], "scores": [1.0],
        })
        qid += 1
    return qs, targets, qid


def build(root: str, num_images: int) -> dict:
    from vilbert_tpu.data.lmdb_reader import LmdbWriter

    os.makedirs(root, exist_ok=True)
    vqa_root = os.path.join(root, "VQA")
    os.makedirs(os.path.join(vqa_root, "cache"), exist_ok=True)
    stats = {}

    # --- features.lmdb: reference converter schema (convert_to_lmdb.py:36-48)
    lmdb_path = os.path.join(root, "features.lmdb")
    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    if not os.path.exists(lmdb_path):
        id_list = []
        with LmdbWriter(lmdb_path) as w:
            for i in range(num_images):
                image_id = str(100000 + i)
                x1 = rng.uniform(0, 320, BOXES)
                y1 = rng.uniform(0, 240, BOXES)
                item = {
                    "image_id": image_id, "image_h": 480, "image_w": 640,
                    "num_boxes": BOXES,
                    "boxes": np.stack(
                        [x1, y1, x1 + rng.uniform(32, 320, BOXES),
                         y1 + rng.uniform(32, 240, BOXES)], 1
                    ).astype(np.float32),
                    "features": rng.randn(BOXES, FDIM).astype(np.float32),
                }
                id_list.append(image_id.encode())
                w.put(image_id.encode(), pickle.dumps(item))
            w.put(b"keys", pickle.dumps(id_list))
    dt = time.perf_counter() - t0
    data_mdb = os.path.join(lmdb_path, "data.mdb")
    mb = os.path.getsize(data_mdb if os.path.exists(data_mdb)
                         else lmdb_path) / 1e6
    stats["lmdb_write"] = {"images": num_images, "mb": round(mb, 1),
                           "s": round(dt, 1),
                           "images_per_s": round(num_images / max(dt, 1e-9), 1)}

    # --- VQA annotations: trainval + minval splits (tasks.yml TASK1 names)
    rng = np.random.RandomState(1)
    image_ids = np.arange(100000, 100000 + num_images)
    labels = rng.randint(0, NUM_ANSWERS, num_images * QS_PER_IMAGE)
    train_imgs = np.repeat(image_ids, QS_PER_IMAGE)
    qs, targets, qid = _questions(rng, train_imgs, labels, 0)
    with open(os.path.join(
            vqa_root, "v2_OpenEnded_mscoco_trainval_questions.json"), "w") as f:
        json.dump({"questions": qs}, f)
    with open(os.path.join(vqa_root, "cache", "trainval_target.pkl"), "wb") as f:
        pickle.dump(targets, f)

    val_imgs = image_ids[rng.randint(0, num_images, MINVAL_QS)]
    val_labels = rng.randint(0, NUM_ANSWERS, MINVAL_QS)
    qs, targets, _ = _questions(rng, val_imgs, val_labels, qid)
    with open(os.path.join(
            vqa_root, "v2_OpenEnded_mscoco_minval_questions.json"), "w") as f:
        json.dump({"questions": qs}, f)
    with open(os.path.join(vqa_root, "cache", "minval_target.pkl"), "wb") as f:
        pickle.dump(targets, f)
    with open(os.path.join(vqa_root, "cache", "trainval_label2ans.pkl"),
              "wb") as f:
        pickle.dump([f"answer{i}" for i in range(3129)], f)
    stats["vqa_annotations"] = {"train_qs": len(train_imgs),
                                "minval_qs": MINVAL_QS}

    # --- retrieval annotations: COCO jsonlines, 5 sentences per image
    rng = np.random.RandomState(2)
    with open(os.path.join(root, "retrieval_val.jsonline"), "w") as f:
        for image_id in image_ids[:200]:
            sents = [" ".join(f"word{rng.randint(999)}"
                              for _ in range(int(rng.randint(5, 12))))
                     for _ in range(5)]
            f.write(json.dumps({"id": int(image_id), "sentences": sents}) + "\n")

    # --- WordPiece vocab
    vocab = os.path.join(root, "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
            + [f"word{i}" for i in range(1000)]) + "\n")

    # --- world tasks.yml (TASK1 pointing into this root)
    with open(os.path.join(root, "tasks.yml"), "w") as f:
        f.write(f"""TASK1:
  name: VQA
  type: VL-classifier
  loss: BCEWithLogitLoss
  process: normal
  task_id: 1
  dataroot: {vqa_root}
  features_path: {os.path.join(root, "features.vfr")}
  features_path_gt: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 23
  max_region_num: 101
  batch_size: 128
  eval_batch_size: 512
  train_split: trainval
  val_split: minval
  lr: 4.0e-05
  num_epoch: 1
""")
    return stats


def run_pipeline(root: str, stats: dict) -> dict:
    env = dict(os.environ)
    vocab = os.path.join(root, "vocab.txt")
    out_dir = os.path.join(root, "out")

    def timed(name, cmd):
        t0 = time.perf_counter()
        r = subprocess.run(cmd, cwd=ROOT, env=env)
        assert r.returncode == 0, f"{name} failed: {cmd}"
        return time.perf_counter() - t0

    # 2. lmdb -> VFR conversion
    dt = timed("convert", [
        sys.executable, "scripts/convert_lmdb_to_vfr.py",
        "--src", os.path.join(root, "features.lmdb"),
        "--dst", os.path.join(root, "features.vfr")])
    n = stats["lmdb_write"]["images"]
    stats["convert_lmdb_to_vfr"] = {
        "s": round(dt, 1), "images_per_s": round(n / dt, 1),
        "mb_per_s": round(stats["lmdb_write"]["mb"] / dt, 1)}

    # 3. loader-only rate (host path the train step consumes)
    from vilbert_tpu.core.config import load_task_configs
    from vilbert_tpu.data.loading import load_datasets
    from vilbert_tpu.data.tokenization import load_tokenizer

    task = load_task_configs(os.path.join(root, "tasks.yml"))
    tok = load_tokenizer(vocab, 30522)
    loaders, _ = load_datasets(task, tok, with_val=False)
    loader = loaders["TASK1"]
    it = iter(loader)
    next(it)  # build/caches out of the timing
    t0 = time.perf_counter()
    batches = 0
    for _ in range(40):
        try:
            next(it)
            batches += 1
        except StopIteration:
            break
    dt = time.perf_counter() - t0
    stats["vqa_loader_only"] = {
        "batches": batches, "batch_size": 128,
        "samples_per_s": round(batches * 128 / dt, 1)}

    # 4. train one epoch of TASK1
    dt = timed("train_tasks", [
        sys.executable, "-m", "vilbert_tpu.cli.train_tasks",
        "--tasks_yml", os.path.join(root, "tasks.yml"), "--tasks", "1",
        "--vocab", vocab, "--num_epochs", "1", "--output_dir", out_dir,
        "--lr_scheduler", "warmup_linear"])
    iters = stats["vqa_annotations"]["train_qs"] // 128
    stats["train_tasks_epoch"] = {
        "s": round(dt, 1), "iters": iters,
        "samples_per_s_wall": round(iters * 128 / dt, 1)}

    params = os.path.join(out_dir, "params_final.npz")
    assert os.path.exists(params), params

    # 5. eval_tasks on minval
    dt = timed("eval_tasks", [
        sys.executable, "-m", "vilbert_tpu.cli.eval_tasks",
        "--tasks_yml", os.path.join(root, "tasks.yml"), "--tasks", "1",
        "--vocab", vocab, "--params", params, "--split", "minval",
        "--output_dir", os.path.join(root, "results")])
    stats["eval_tasks_minval"] = {"s": round(dt, 1), "questions": MINVAL_QS}

    # 6. eval_retrieval: published 5-captions protocol over a 100-image pool
    dt = timed("eval_retrieval", [
        sys.executable, "-m", "vilbert_tpu.cli.eval_retrieval",
        "--store", os.path.join(root, "features.vfr"),
        "--annotations", os.path.join(root, "retrieval_val.jsonline"),
        "--vocab", vocab, "--params", params, "--fast_mode",
        "--pool_size", "100", "--chunk", "100",
        "--output", os.path.join(root, "retrieval_result.json")])
    stats["eval_retrieval_100pool"] = {"s": round(dt, 1), "captions": 500}
    return stats


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/rehearsal")
    p.add_argument("--num_images", type=int, default=6000)
    p.add_argument("--run", action="store_true",
                   help="run the full pipeline after building the world")
    args = p.parse_args()

    stats = build(args.root, args.num_images)
    print(json.dumps({"build": stats}, indent=1))
    if args.run:
        stats = run_pipeline(args.root, stats)
        print(json.dumps({"rehearsal": stats}, indent=1))


if __name__ == "__main__":
    main()
