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
features (each image's regions carry a planted class direction —
features = N(0,1) + ALPHA * dir[label] — so the answer is strongly
linearly decodable from the mean region feature) AND the question text
(the question names its answer word), so a couple of from-scratch epochs
demonstrably move the eval score far above chance — this is a pipeline
rehearsal, not a claim about synthetic-data accuracy.

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


# planted per-class feature directions: every region of an image with
# label c is N(0,1) + ALPHA * dir_c (unit norm), so the class is many-sigma
# separable from the 36-region mean — linearly decodable at init. ALPHA
# sets how fast a from-scratch model crosses the post-prior-fit learning
# takeoff (measured on this world: ALPHA=2 takes ~600+ full-LR steps at
# batch 32, longer at batch 128; ALPHA=4 still plateaued through 1500
# steps on some seeds — from-scratch takeoff is capricious, so the
# rehearsal plants the strongest reasonable signal)
ALPHA = 8.0
_dirs = np.random.RandomState(7).randn(NUM_ANSWERS, FDIM).astype(np.float32)
CLASS_DIRS = _dirs / np.linalg.norm(_dirs, axis=1, keepdims=True)


def _image_record(rng):
    """One image's (label, boxes, features) — the SAME rng draws as the
    lmdb write loop, so labels can be recomputed without re-reading the db."""
    label = int(rng.randint(NUM_ANSWERS))
    x1 = rng.uniform(0, 320, BOXES)
    y1 = rng.uniform(0, 240, BOXES)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(32, 320, BOXES),
         y1 + rng.uniform(32, 240, BOXES)], 1
    ).astype(np.float32)
    features = (rng.randn(BOXES, FDIM) + ALPHA * CLASS_DIRS[label]).astype(
        np.float32)
    return label, boxes, features


def _questions(rng, image_ids, labels, start_qid):
    """VQA v2 question/target records. The label is recoverable two ways —
    from the image (regions carry the planted class direction, see
    CLASS_DIRS) and from the text (the question names word<label>) — so a
    couple of epochs demonstrably move the eval score far above chance."""
    qs, targets = [], []
    qid = start_qid
    for image_id, label in zip(image_ids, labels):
        # no filler tokens: with near-uniform attention at init, [CLS]
        # pools ~the mean token embedding, so the answer word must be the
        # only VARYING content token for the head to latch onto the text
        # channel early — random filler words drowned it (r5 runs 12-14:
        # score pinned at chance through 1500+ steps with 4-9 fillers)
        qs.append({
            "question_id": qid, "image_id": int(image_id),
            "question": f"what is word{label} ?",
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
    image_label = np.empty(num_images, np.int64)
    fresh = not os.path.exists(lmdb_path)
    if fresh:
        id_list = []
        with LmdbWriter(lmdb_path) as w:
            for i in range(num_images):
                image_id = str(100000 + i)
                label, boxes, features = _image_record(rng)
                image_label[i] = label
                item = {
                    "image_id": image_id, "image_h": 480, "image_w": 640,
                    "num_boxes": BOXES,
                    "boxes": boxes,
                    "features": features,
                }
                id_list.append(image_id.encode())
                w.put(image_id.encode(), pickle.dumps(item))
            w.put(b"keys", pickle.dumps(id_list))
    else:
        # replay the deterministic draws to recover the per-image labels
        for i in range(num_images):
            label, _, _ = _image_record(rng)
            image_label[i] = label
    dt = time.perf_counter() - t0
    data_mdb = os.path.join(lmdb_path, "data.mdb")
    mb = os.path.getsize(data_mdb if os.path.exists(data_mdb)
                         else lmdb_path) / 1e6
    stats["lmdb_write"] = {"images": num_images, "mb": round(mb, 1)}
    if fresh:  # a reused db's replay time is not a write rate
        stats["lmdb_write"].update(
            s=round(dt, 1),
            images_per_s=round(num_images / max(dt, 1e-9), 1))
    else:
        stats["lmdb_write"]["reused"] = True

    # --- VQA annotations: trainval + minval splits (tasks.yml TASK1 names).
    # Per-image label = the class whose planted direction the image's
    # regions carry (learnable from the visual stream alone; the question
    # text names the same answer word as a second channel).
    rng = np.random.RandomState(1)
    image_ids = np.arange(100000, 100000 + num_images)
    train_imgs = np.repeat(image_ids, QS_PER_IMAGE)
    labels = np.repeat(image_label, QS_PER_IMAGE)
    qs, targets, qid = _questions(rng, train_imgs, labels, 0)
    with open(os.path.join(
            vqa_root, "v2_OpenEnded_mscoco_trainval_questions.json"), "w") as f:
        json.dump({"questions": qs}, f)
    with open(os.path.join(vqa_root, "cache", "trainval_target.pkl"), "wb") as f:
        pickle.dump(targets, f)

    val_idx = rng.randint(0, num_images, MINVAL_QS)
    val_imgs = image_ids[val_idx]
    val_labels = image_label[val_idx]
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

    # --- world-sized model geometry. A from-scratch run has a long
    # prior-fitting plateau before the score takes off (bert_base
    # geometries plateau far longer than the rehearsal's step budget,
    # which is why the reference only ever FINE-TUNES VQA from a
    # CC-pretrained checkpoint). Two fields deviate from the flagship
    # config to make the from-scratch takeoff reliable:
    #  - fusion_method "sum" (a reference option): "mul" multiplies the
    #    two tanh-pooler outputs, which at init are ~0.02-scale, so each
    #    stream's gradient is scaled by the OTHER stream's near-zero
    #    pooled vector — a double suppression that kept the score pinned
    #    at chance for 1500+ steps on every "mul" run (r5 runs 12-15);
    #    fine-tuning never sees this (pretrained poolers saturate tanh),
    #  - dropout 0.0: variance reduction for a tiny 10-epoch demo.
    # Pass any reference geometry via --config on a box with a real
    # dataset + checkpoint.
    with open(os.path.join(root, "model_config.json"), "w") as f:
        json.dump({
            "vocab_size": 30522, "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
            "hidden_act": "gelu", "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0,
            "max_position_embeddings": 512, "type_vocab_size": 2,
            "initializer_range": 0.02, "v_feature_size": 2048,
            "v_target_size": 1601, "v_hidden_size": 64,
            "v_num_hidden_layers": 2, "v_num_attention_heads": 4,
            "v_intermediate_size": 128,
            "v_attention_probs_dropout_prob": 0.0, "v_hidden_act": "gelu",
            "v_hidden_dropout_prob": 0.0, "v_initializer_range": 0.02,
            "bi_hidden_size": 64, "bi_num_attention_heads": 4,
            "bi_intermediate_size": 128, "bi_attention_type": 1,
            "v_biattention_id": [0, 1], "t_biattention_id": [0, 1],
            "fusion_method": "sum",
        }, f, indent=1)

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
  batch_size: 32
  eval_batch_size: 512
  train_split: trainval
  val_split: minval
  lr: 1.0e-03
  num_epoch: 8
""")
    return stats


def run_pipeline(root: str, stats: dict, config: str, epochs: int = 2) -> dict:
    env = dict(os.environ)
    vocab = os.path.join(root, "vocab.txt")
    out_dir = os.path.join(root, "out")

    def timed(name, cmd, extra_env=None):
        t0 = time.perf_counter()
        e = dict(env, **extra_env) if extra_env else env
        r = subprocess.run(cmd, cwd=ROOT, env=e)
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
    import jax

    # honor a JAX_PLATFORMS=cpu fallback (sick TPU tunnel) the same way the
    # CLIs do — the env var alone is ignored once a plugin self-registers
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vilbert_tpu.core.config import load_task_configs

    stats["platform"] = jax.default_backend()
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
        "batches": batches, "batch_size": 32,
        "samples_per_s": round(batches * 32 / dt, 1)}

    # 4. train TASK1 from scratch (TPU when the tunnel is up; --config sizes
    # the model to the box — VERDICT r4 item 2 asked for this knob).
    # A from-scratch run needs four deviations from the reference's
    # FINE-TUNING defaults (each measured on this world, r5 logs):
    #  - lr 1e-3 (tasks.yml): at the reference's 4e-5/2e-4 the model has
    #    not even fit the answer PRIOR after two epochs;
    #  - --head_lr matches the trunk: at 1e-4 the 3129-way head takes
    #    thousands of steps just to fit the prior (output bias -> -3 nats);
    #  - warmup_constant: the post-plateau takeoff needs full LR late in
    #    the run — warmup_linear's decay starves exactly the steps that
    #    learn;
    #  - --adam_correct_bias --clip_grad_norm 1: the reference's
    #    AdamW(correct_bias=False) shrinks early updates by
    #    sqrt(1-0.999^t)/(1-0.9^t) (~3-10x for the first ~1000 steps) and
    #    the unclipped prior-fit gradient spike (norm ~4e3) inflates the
    #    second moment, together stretching the plateau past the whole
    #    run. Fine-tuning from a checkpoint (the only mode the reference
    #    ships recipes for) never sees either regime.
    dt = timed("train_tasks", [
        sys.executable, "-m", "vilbert_tpu.cli.train_tasks",
        "--config", config,
        "--tasks_yml", os.path.join(root, "tasks.yml"), "--tasks", "1",
        "--vocab", vocab, "--num_epochs", str(epochs),
        "--head_lr", "1e-3", "--warmup_proportion", "0.02",
        "--adam_correct_bias", "--clip_grad_norm", "1",
        "--output_dir", out_dir, "--lr_scheduler", "warmup_constant"])
    iters = stats["vqa_annotations"]["train_qs"] // 32 * epochs
    stats["train_tasks_epochs"] = {
        "s": round(dt, 1), "iters": iters, "epochs": epochs,
        "config": os.path.basename(config),
        "samples_per_s_wall": round(iters * 32 / dt, 1)}

    params = os.path.join(out_dir, "params_final.npz")
    assert os.path.exists(params), params

    # 5. eval_tasks on minval; the score comes back via the metrics JSON the
    # CLI writes next to the submission records
    results_dir = os.path.join(root, "results")
    dt = timed("eval_tasks", [
        sys.executable, "-m", "vilbert_tpu.cli.eval_tasks",
        "--config", config,
        "--tasks_yml", os.path.join(root, "tasks.yml"), "--tasks", "1",
        "--vocab", vocab, "--params", params, "--split", "minval",
        "--output_dir", results_dir])
    with open(os.path.join(results_dir, "metrics_VQA_minval.json")) as f:
        metrics = json.load(f)
    chance = 1.0 / NUM_ANSWERS
    stats["eval_tasks_minval"] = {
        "s": round(dt, 1), "questions": MINVAL_QS,
        "score": round(metrics["score"], 4), "chance": chance}
    assert metrics["score"] > 2 * chance, (
        f"one-epoch score {metrics['score']:.4f} not above chance {chance}")

    # 6. eval_retrieval: published 5-captions protocol over a 100-image pool.
    # Runs on the TPU: the scorers take params as a jit ARGUMENT (closed-over
    # host params used to inline ~1 GB of HLO constants, which tripped the
    # remote-compile request size limit).
    dt = timed("eval_retrieval", [
        sys.executable, "-m", "vilbert_tpu.cli.eval_retrieval",
        "--config", config,
        "--store", os.path.join(root, "features.vfr"),
        "--annotations", os.path.join(root, "retrieval_val.jsonline"),
        "--vocab", vocab, "--params", params, "--fast_mode",
        "--pool_size", "100", "--chunk", "100",
        "--output", os.path.join(root, "retrieval_result.json")])
    with open(os.path.join(root, "retrieval_result.json")) as f:
        ret = json.load(f)
    stats["eval_retrieval_100pool"] = {
        "s": round(dt, 1), "captions": ret["num_captions"],
        "r1": ret["r1"], "r5": ret["r5"], "r10": ret["r10"]}
    return stats


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/rehearsal")
    p.add_argument("--num_images", type=int, default=6000)
    p.add_argument("--run", action="store_true",
                   help="run the full pipeline after building the world")
    p.add_argument("--config", default="",
                   help="model geometry JSON for train/eval stages; default "
                        "= the world-sized {root}/model_config.json (a "
                        "from-scratch run must cross the learning takeoff "
                        "within the step budget — reference geometries need "
                        "a real dataset + pretrained checkpoint)")
    p.add_argument("--epochs", type=int, default=8)
    args = p.parse_args()

    stats = build(args.root, args.num_images)
    print(json.dumps({"build": stats}, indent=1))
    if args.run:
        config = args.config or os.path.join(args.root, "model_config.json")
        stats = run_pipeline(args.root, stats, config, args.epochs)
        print(json.dumps({"rehearsal": stats}, indent=1))


if __name__ == "__main__":
    main()
