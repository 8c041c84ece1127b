"""CLI: image↔text retrieval ranking (mirrors reference eval_retrieval.py).

  python -m vilbert_tpu.cli.eval_retrieval \\
      --config configs/bert_base_6layer_6conect.json \\
      --store data/coco_val.vfr --captions data/caption_val.json \\
      --params multi_task_model.bin          # fine-tuned (vil_logit)
  ... --zero_shot                            # alignment-score mode

  # smoke test: --synthetic
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/bert_base_6layer_6conect.json")
    p.add_argument("--store", default="")
    p.add_argument("--annotations", default="",
                   help="reference val jsonlines ({id|img_path, sentences:"
                        "[5 captions]}, retreival_dataset.py:301-322) — the "
                        "published protocol: ALL 5N captions are ranked "
                        "against the N-image pool")
    p.add_argument("--task_name", default="RetrievalCOCO",
                   choices=["RetrievalCOCO", "RetrievalFlickr30k"])
    p.add_argument("--captions", default="",
                   help="legacy {image_id: caption} json — ONE caption per "
                        "image; NOT comparable to published R@K (use "
                        "--annotations)")
    p.add_argument("--vocab", default="")
    p.add_argument("--params", default="")
    p.add_argument("--zero_shot", action="store_true")
    p.add_argument("--baseline", action="store_true",
                   help="score with the single-stream baseline "
                        "(reference eval_retrieval.py --baseline)")
    p.add_argument("--pool_size", type=int, default=1000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--max_seq_length", type=int, default=30)
    p.add_argument("--max_region_num", type=int, default=101)
    p.add_argument("--output", default="retrieval_result.json")
    p.add_argument("--fast_mode", action="store_true",
                   help="run the text stream once per caption and broadcast "
                        "it over the image pool inside the encoder")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args(argv)

    from vilbert_tpu.utils.cache import (
        enable_compilation_cache, force_requested_platform,
    )

    force_requested_platform()
    enable_compilation_cache()

    import jax

    from vilbert_tpu.core.config import ModelConfig
    from vilbert_tpu.data.feature_store import (
        InMemoryFeatureStore, open_feature_store, read_with_global,
    )
    from vilbert_tpu.data.tasks import _pad_text
    from vilbert_tpu.data.tokenization import add_special_single, load_tokenizer
    from vilbert_tpu.eval.retrieval import (
        evaluate_retrieval, make_alignment_scorer, make_vil_logit_scorer,
    )

    # fast_mode broadcasts one caption over the image pool inside the encoder
    # (reference eval_retrieval.py:220, vilbert.py:1042-1053)
    model_cfg = ModelConfig.from_json_file(args.config, fast_mode=args.fast_mode)
    tokenizer = load_tokenizer(args.vocab or None, model_cfg.vocab_size)

    # caption_entries: ordered [(caption_text, image_id)]; the pool is the
    # ordered unique image list. With --annotations this reproduces the
    # reference protocol exactly: 5 captions per image, 5N x N score matrix
    # (retreival_dataset.py:301-471).
    if args.synthetic:
        store = InMemoryFeatureStore.synthetic(num_images=8, num_boxes=8)
        keys = store.keys()
        caption_entries = [
            (f"synthetic caption {j} for image {k}", k)
            for k in keys for j in range(5)
        ]
        args.pool_size, args.chunk = 8, 4
        args.max_region_num = 10
    elif args.annotations:
        from vilbert_tpu.data.annotations import load_retrieval

        assert args.store, "--store required"
        store = open_feature_store(args.store)
        anns = load_retrieval(args.annotations, args.task_name)
        available = set(store.keys())
        keys, seen = [], set()
        for a in anns:
            if a.image_id not in seen and a.image_id in available:
                seen.add(a.image_id)
                keys.append(a.image_id)
        keys = keys[: args.pool_size]
        kept = set(keys)
        caption_entries = [
            (a.text, a.image_id) for a in anns if a.image_id in kept
        ]
    else:
        assert args.store and args.captions, (
            "--store plus --annotations (protocol) or --captions (legacy)"
        )
        store = open_feature_store(args.store)
        captions = json.load(open(args.captions))
        keys = store.keys()[: args.pool_size]
        caption_entries = [(captions[k], k) for k in keys]
        logging.warning(
            "--captions gives ONE caption per image; published COCO/Flickr "
            "R@K uses 5 per image — pass --annotations for the real protocol"
        )

    R = args.max_region_num

    feats = np.zeros((len(keys), R, model_cfg.v_feature_size), np.float32)
    spats = np.zeros((len(keys), R, 5), np.float32)
    masks = np.zeros((len(keys), R), np.int32)
    for i, k in enumerate(keys):
        out = read_with_global(store.get(k))
        n = min(out.num_boxes, R)
        feats[i, :n] = out.features[:n]
        spats[i, :n] = out.locations[:n]
        masks[i, :n] = 1
    pool = {"features": feats, "spatials": spats, "image_mask": masks}

    pool_index = {k: i for i, k in enumerate(keys)}

    def caption_iter():
        for text, image_id in caption_entries:
            ids = add_special_single(
                tokenizer,
                list(tokenizer.encode(text))[: args.max_seq_length - 2],
            )
            q, m, s = _pad_text(ids, args.max_seq_length)
            yield {"question": q, "input_mask": m, "segment_ids": s,
                   "target_index": pool_index[image_id]}

    if args.zero_shot:
        if args.baseline:
            from vilbert_tpu.models.basebert import BaseBertForPretraining

            model = BaseBertForPretraining(model_cfg)
        else:
            from vilbert_tpu.models.vilbert import ViLBERTForPretraining

            model = ViLBERTForPretraining(model_cfg)
    elif args.baseline:
        from vilbert_tpu.models.basebert import BaseBertForVLTasks

        model = BaseBertForVLTasks(model_cfg)
    else:
        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

        model = ViLBERTForVLTasks(model_cfg)

    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((2, args.max_seq_length), np.int32),
        feats[:2], spats[:2],
    )["params"]
    if args.params:
        if args.params.endswith(".npz"):
            from vilbert_tpu.core.checkpoint import load_params

            params = load_params(args.params)
        else:
            from vilbert_tpu.core.checkpoint import load_pretrained_torch

            params, _ = load_pretrained_torch(args.params, params)

    scorer = (
        make_alignment_scorer(model, params)
        if args.zero_shot
        else make_vil_logit_scorer(model, params)
    )
    metrics = evaluate_retrieval(
        scorer, caption_iter(), pool, chunk=args.chunk,
        fast_mode=args.fast_mode and not args.zero_shot,
    )
    metrics["num_captions"] = len(caption_entries)
    metrics["pool_size"] = len(keys)
    logging.info("retrieval: %s", metrics)
    with open(args.output, "w") as f:
        json.dump(metrics, f)


if __name__ == "__main__":
    main()
