"""CLI: per-task evaluation + submission files (mirrors reference
eval_tasks.py).

  python -m vilbert_tpu.cli.eval_tasks \\
      --config configs/bert_base_6layer_6conect.json \\
      --tasks_yml configs/tasks.yml --tasks 1 \\
      --params checkpoints/multitask/params_final.npz --output_dir results/

  # smoke test: --synthetic
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/bert_base_6layer_6conect.json")
    p.add_argument("--tasks_yml", default="configs/tasks.yml")
    p.add_argument("--tasks", default="1")
    p.add_argument("--params", default="", help=".npz or torch .bin checkpoint")
    p.add_argument("--vocab", default="",
                   help="WordPiece vocab.txt (required for real data: "
                        "reference BertTokenizer, task_utils.py:396)")
    p.add_argument("--output_dir", default="results")
    p.add_argument("--split", default="val")
    p.add_argument("--task_specific_tokens", action="store_true")
    p.add_argument("--dynamic_attention", action="store_true")
    p.add_argument("--baseline", action="store_true",
                   help="evaluate the single-stream baseline "
                        "(reference eval_tasks.py:236-252)")
    p.add_argument("--batch_size", type=int, default=0,
                   help="override the per-task eval batch size")
    p.add_argument("--int8", action="store_true",
                   help="dynamic int8 matmuls for inference (ops/quant.py)")
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args(argv)

    from vilbert_tpu.utils.cache import (
        enable_compilation_cache, force_requested_platform,
    )

    force_requested_platform()
    enable_compilation_cache()

    import jax

    from vilbert_tpu.core.config import ModelConfig, load_task_configs
    from vilbert_tpu.eval.evaluators import evaluate_task, save_results
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

    model_cfg = ModelConfig.from_json_file(
        args.config,
        task_specific_tokens=args.task_specific_tokens,
        dynamic_attention=args.dynamic_attention,
        use_pallas_attention=args.use_pallas,
        int8_matmul=args.int8,
    )
    all_tasks = load_task_configs(args.tasks_yml)
    selected = {f"TASK{n}": all_tasks[f"TASK{n}"] for n in args.tasks.split("-")}
    if args.batch_size:
        import dataclasses

        selected = {
            k: dataclasses.replace(t, eval_batch_size=args.batch_size)
            for k, t in selected.items()
        }

    if args.synthetic:
        from vilbert_tpu.cli.train_tasks import _synthetic_world

        loaders = _synthetic_world(selected, model_cfg.vocab_size)
    else:
        from vilbert_tpu.data.loading import load_datasets
        from vilbert_tpu.data.tokenization import load_tokenizer

        assert args.vocab, (
            "--vocab is required with real data: without the WordPiece "
            "vocab, questions would be tokenized by the synthetic "
            "HashTokenizer and scores would be garbage"
        )
        tokenizer = load_tokenizer(args.vocab, model_cfg.vocab_size)
        _, loaders = load_datasets(selected, tokenizer, with_val=True)

    def task_label2ans(task):
        """Answer vocabulary for VQA/GQA submission records
        (reference eval_tasks.py:303-316 writes label2ans[argmax])."""
        if args.synthetic or task.type not in (
            "VL-classifier", "VL-classifier-GQA"
        ):
            return None
        from vilbert_tpu.data.annotations import load_label2ans

        try:
            return load_label2ans(task.dataroot)
        except (FileNotFoundError, OSError):
            logging.warning(
                "%s: no cache/trainval_label2ans.pkl under %r — submission "
                "records will carry integer labels", task.name, task.dataroot,
            )
            return None

    if args.baseline:
        from vilbert_tpu.models.basebert import BaseBertForVLTasks

        model = BaseBertForVLTasks(model_cfg)
    else:
        model = ViLBERTForVLTasks(model_cfg)
    first = next(iter(next(iter(loaders.values()))))
    params = model.init(
        jax.random.PRNGKey(0),
        first["question"].reshape(-1, first["question"].shape[-1]),
        first["features"].reshape(-1, *first["features"].shape[-2:]),
        first["spatials"].reshape(-1, *first["spatials"].shape[-2:]),
    )["params"]
    if args.params:
        if args.params.endswith(".npz"):
            from vilbert_tpu.core.checkpoint import load_params

            params = load_params(args.params)
        else:
            from vilbert_tpu.core.checkpoint import load_pretrained_torch

            params, report = load_pretrained_torch(args.params, params)
            logging.info("loaded %d params (%d missing)", len(report.loaded),
                         len(report.missing))

    for key, task in selected.items():
        metrics, results = evaluate_task(
            model, model_cfg, task, params, loaders[key],
            label2ans=task_label2ans(task),
            qid_map=getattr(loaders[key].dataset, "qid_map", None),
        )
        logging.info("%s: loss %.4f score %.4f (%d samples)",
                     key, metrics["loss"], metrics["score"],
                     metrics["num_samples"])
        # machine-readable metrics next to the submission records — the
        # reference only prints (eval_tasks.py:199-207); downstream harnesses
        # (scripts/scale_rehearsal.py) read this instead of scraping logs
        os.makedirs(args.output_dir, exist_ok=True)
        mpath = os.path.join(
            args.output_dir, f"metrics_{task.name}_{args.split}.json")
        with open(mpath, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)
        if results:
            path = save_results(results, args.output_dir, task.name, args.split)
            logging.info("wrote %s", path)


if __name__ == "__main__":
    main()
