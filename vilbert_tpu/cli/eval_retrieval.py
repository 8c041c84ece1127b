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
    p.add_argument("--captions", default="")
    p.add_argument("--vocab", default="")
    p.add_argument("--params", default="")
    p.add_argument("--zero_shot", action="store_true")
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

    from vilbert_tpu.utils.cache import enable_compilation_cache

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

    if args.synthetic:
        store = InMemoryFeatureStore.synthetic(num_images=8, num_boxes=8)
        captions = {k: f"a caption for image {k}" for k in store.keys()}
        args.pool_size, args.chunk = 8, 4
        args.max_region_num = 10
    else:
        assert args.store and args.captions
        store = open_feature_store(args.store)
        captions = json.load(open(args.captions))

    keys = store.keys()[: args.pool_size]
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

    def caption_iter():
        for i, k in enumerate(keys):
            ids = add_special_single(
                tokenizer,
                list(tokenizer.encode(captions[k]))[: args.max_seq_length - 2],
            )
            q, m, s = _pad_text(ids, args.max_seq_length)
            yield {"question": q, "input_mask": m, "segment_ids": s,
                   "target_index": i}

    if args.zero_shot:
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining

        model = ViLBERTForPretraining(model_cfg)
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
    logging.info("retrieval: %s", metrics)
    with open(args.output, "w") as f:
        json.dump(metrics, f)


if __name__ == "__main__":
    main()
