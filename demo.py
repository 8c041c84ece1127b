#!/usr/bin/env python
"""End-to-end demo: all task heads on one image (reference demo.ipynb).

The reference notebook runs a GPU Faster-R-CNN feature extractor in-process
(maskrcnn-benchmark, demo.ipynb cell 1) then prints every head's prediction
for a typed question. Feature extraction is an offline prerequisite here
(data/README of the reference); this demo consumes precomputed features from
a .vfr/.lmdb store — or synthesizes them with --synthetic — and runs
``custom_prediction``: tokenize, forward with all heads, print VQA/GQA
answers, vision-grounding boxes, and alignment scores.

  python demo.py --synthetic --question "what is on the table?"
  python demo.py --store feats.vfr --image_id 42 \\
      --params multi_task_model.npz --vocab vocab.txt --question "..."
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/bert_base_2layer_2conect.json")
    p.add_argument("--store", default="")
    p.add_argument("--image_id", default="0")
    p.add_argument("--params", default="")
    p.add_argument("--vocab", default="")
    p.add_argument("--question", default="what is in the image?")
    p.add_argument("--task", type=int, default=1)
    p.add_argument("--max_seq_length", type=int, default=30)
    p.add_argument("--max_region_num", type=int, default=37)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="dynamic int8 inference matmuls (ops/quant.py)")
    args = p.parse_args()

    import jax

    # The demo is EAGER (per-op dispatch, reference demo.ipynb semantics);
    # on a remote-TPU backend every eager op is a round-trip — and a sick
    # tunnel blocks forever at first touch. Always run on host CPU; the
    # jitted CLIs are the TPU surfaces.
    jax.config.update("jax_platforms", "cpu")

    from vilbert_tpu.core.config import ModelConfig
    from vilbert_tpu.data.feature_store import (
        InMemoryFeatureStore, open_feature_store, read_with_global,
    )
    from vilbert_tpu.data.tasks import _pad_text
    from vilbert_tpu.data.tokenization import add_special_single, load_tokenizer
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

    cfg = ModelConfig.from_json_file(args.config, int8_matmul=args.int8)
    tokenizer = load_tokenizer(args.vocab or None, cfg.vocab_size)
    store = (
        InMemoryFeatureStore.synthetic(num_images=4, num_boxes=36)
        if args.synthetic or not args.store
        else open_feature_store(args.store)
    )

    out = read_with_global(store.get(args.image_id))
    R = args.max_region_num
    feats = np.zeros((1, R, cfg.v_feature_size), np.float32)
    spats = np.zeros((1, R, 5), np.float32)
    mask = np.zeros((1, R), np.int32)
    n = min(out.num_boxes, R)
    feats[0, :n] = out.features[:n]
    spats[0, :n] = out.locations[:n]
    mask[0, :n] = 1

    ids = add_special_single(
        tokenizer, list(tokenizer.encode(args.question))[: args.max_seq_length - 2]
    )
    q, qm, sg = _pad_text(ids, args.max_seq_length)
    q, qm, sg = q[None], qm[None], sg[None]

    model = ViLBERTForVLTasks(cfg)
    params = model.init(jax.random.PRNGKey(0), q, feats, spats)["params"]
    if args.params:
        if args.params.endswith(".npz"):
            from vilbert_tpu.core.checkpoint import load_params

            params = load_params(args.params)
        else:
            from vilbert_tpu.core.checkpoint import load_pretrained_torch

            params, _ = load_pretrained_torch(args.params, params)

    # custom_prediction: every head at once (reference demo.ipynb cell 4)
    out = model.apply({"params": params}, q, feats, spats, sg, qm, mask)

    print(f"question: {args.question!r}  image: {args.image_id}")
    print(f"vqa answer idx:   {int(np.argmax(out.vil_prediction[0]))}")
    print(f"gqa answer idx:   {int(np.argmax(out.vil_prediction_gqa[0]))}")
    tri = np.asarray(jax.nn.softmax(out.vil_tri_prediction[0]))
    print(f"snli-ve probs:    contradiction {tri[0]:.3f} neutral {tri[1]:.3f} "
          f"entailment {tri[2]:.3f}")
    grounding = np.asarray(out.vision_logit[0, :, 0])
    best = int(np.argmax(grounding))
    print(f"grounded region:  row {best} (logit {grounding[best]:.3f}) "
          f"box {np.asarray(spats[0, best, :4])}")
    print(f"vil_logit score:  {float(out.vil_logit[0, 0]):.4f}")


if __name__ == "__main__":
    main()
