"""CLI: 12-in-1 multi-task fine-tuning (mirrors reference train_tasks.py).

Example (flagship recipe, reference README.md:67):
  python -m vilbert_tpu.cli.train_tasks \\
      --config configs/bert_base_6layer_6conect.json \\
      --tasks_yml configs/tasks.yml --tasks 1-2-4-7-8-9-10-11-12-13-15-17 \\
      --from_pretrained pretrained_model.bin --task_specific_tokens

  # smoke test without data artifacts:
  python -m vilbert_tpu.cli.train_tasks --synthetic --tasks 1-12 --num_epochs 1
"""

from __future__ import annotations

import argparse
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/bert_base_6layer_6conect.json")
    p.add_argument("--tasks_yml", default="configs/tasks.yml")
    p.add_argument("--tasks", default="1", help="dash-separated task numbers")
    p.add_argument("--from_pretrained", default="")
    p.add_argument("--vocab", default="")
    p.add_argument("--output_dir", default="checkpoints/multitask")
    p.add_argument("--num_epochs", type=int, default=0, help="0 = max task epochs")
    p.add_argument("--learning_rate", type=float, default=0.0,
                   help="0 = min of per-task lrs (reference behavior)")
    p.add_argument("--head_lr", type=float, default=1e-4,
                   help="lr for task heads (train_tasks.py:379-398)")
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--adam_correct_bias", action="store_true",
                   help="enable Adam bias correction. The reference runs "
                   "WITHOUT it (AdamW(correct_bias=False), "
                   "train_tasks.py:425) — fine for fine-tuning, but "
                   "uncorrected beta2=0.999 shrinks early updates ~3-10x "
                   "for the first ~1000 steps, which cripples FROM-SCRATCH "
                   "runs; flip this on for those")
    p.add_argument("--clip_grad_norm", type=float, default=0.0,
                   help="global grad-norm clip before the optimizer; 0 = "
                   "off (the reference multi-task loop never clips). "
                   "From-scratch runs want ~1.0: the initial prior-fit "
                   "gradient spike otherwise inflates Adam's second moment "
                   "and suppresses learning for ~1/(1-beta2) steps")
    p.add_argument("--bf16_adam_state", action="store_true",
                   help="store Adam moments (m, v) in bfloat16 — halves "
                        "optimizer HBM state; accumulation stays fp32 "
                        "(docs/perf.md)")
    p.add_argument("--bf16_grads", action="store_true",
                   help="materialize gradients in bfloat16 (docs/perf.md)")
    p.add_argument("--lr_scheduler", default="mannul",
                   choices=["mannul", "automatic", "cosine", "cosine_warm",
                            "warmup_linear", "warmup_constant", "constant"])
    p.add_argument("--optim", default="adamw", choices=["adamw", "radam"])
    p.add_argument("--baseline", action="store_true",
                   help="single-stream basebert model (train_tasks.py:232-237)")
    p.add_argument("--resume_file", default="",
                   help="orbax checkpoint dir to resume full training state")
    p.add_argument("--freeze", default="",
                   help="param path prefix(es, comma-separated) to freeze; "
                   "an INTEGER N reproduces the reference semantics (freeze "
                   "text embeddings + text encoder layers 0..N, reference "
                   "train_tasks.py:381-393; -1 = nothing)")
    p.add_argument("--train_iter_gap", type=int, default=4)
    p.add_argument("--train_iter_multiplier", type=float, default=1.0,
                   help="scale per-task iterations/epoch (train_tasks.py:339)")
    p.add_argument("--vision_scratch", action="store_true",
                   help="train fresh (non-text-BERT) weights at head_lr "
                   "(train_tasks.py:400-411)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--save_name", default="",
                   help="suffix for the run directory under output_dir "
                   "(train_tasks.py:253-261)")
    p.add_argument("--clean_train_sets", type=lambda s: s.lower() != "false",
                   default=True, metavar="BOOL",
                   help="drop test-set image ids from train annotations "
                   "(train_tasks.py:199-204; default true)")
    p.add_argument("--eval_cadence", default="reference",
                   choices=["reference", "epoch"],
                   help="'reference': evaluate a task each time it wraps its "
                   "train loader (train_tasks.py:583-586); 'epoch': every "
                   "task at every epoch end")
    p.add_argument("--bert_model", default="bert-base-uncased",
                   help="'roberta' selects RoBERTa embeddings "
                        "(train_tasks.py:359-360)")
    p.add_argument("--task_specific_tokens", action="store_true")
    p.add_argument("--dynamic_attention", action="store_true")
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    # multi-host runtime (reference torch.distributed --local_rank/NCCL env,
    # train_tasks.py:269-278). On TPU pod slices leave unset (auto-detect).
    p.add_argument("--coordinator", default="",
                   help="coordinator host:port for jax.distributed")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    return p


def freeze_prefixes(spec: str):
    """Expand --freeze into param-path prefixes.

    An integer N reproduces the reference (train_tasks.py:381-393: freeze
    the params named in the bert weight manifest whose layer number ≤ N —
    i.e. the TEXT embeddings and text encoder layers 0..N; -1 = none).
    Otherwise: comma-separated literal path prefixes.
    """
    spec = spec.strip()
    if not spec:
        return ()
    try:
        n = int(spec)
    except ValueError:
        return tuple(s.strip() for s in spec.split(",") if s.strip())
    if n < 0:
        return ()
    # both family spellings: two-stream vilbert nests text layers under
    # bert.encoder.layer_N, the single-stream baseline under bert.layer_N
    # (prefixes that match nothing are inert)
    return ("bert.embeddings.",) + tuple(
        f"bert.encoder.layer_{i}." for i in range(n + 1)
    ) + tuple(
        f"bert.layer_{i}." for i in range(n + 1)
    )


def _synthetic_world(task_cfgs, tokenizer_vocab):
    """Synthetic loaders for the selected tasks (tests/dev machines)."""
    from vilbert_tpu.data import synthetic as syn
    from vilbert_tpu.data.tasks import DATASET_REGISTRY, DataLoader
    from vilbert_tpu.data.tokenization import HashTokenizer

    tok = HashTokenizer(tokenizer_vocab)
    store = syn.synthetic_store(num_images=16, num_boxes=8, feature_dim=2048)
    loaders = {}
    for key, t in task_cfgs.items():
        mk = dict(tokenizer=tok, max_seq_length=t.max_seq_length,
                  max_region_num=min(t.max_region_num, 20))
        cls = DATASET_REGISTRY[t.name]
        if t.type in ("VL-classifier", "VL-classifier-GQA"):
            ds = cls(syn.vqa_annotations(num=16, num_labels=3129), store,
                     num_labels=3129, **mk)
        elif t.type == "VL-logit" and t.process == "expand":
            ds = cls(syn.expand_annotations(num=8), store, **mk)
        elif t.type == "VL-logit":
            ds = cls(syn.retrieval_annotations(num=8), store, **mk)
        elif t.type == "V-logit":
            ds = cls(syn.grounding_annotations(store, num=16), store, **mk)
        elif t.type == "V-logit-mc":
            mk["max_region_num"] = 108
            ds = cls(syn.pointing_annotations(store, num=8), store, **mk)
        elif t.type == "VL-binary-classifier" and t.process == "nlvr":
            ds = cls(syn.nlvr2_annotations(num=8), store, **mk)
        else:
            ds = DATASET_REGISTRY["VisualEntailment"](
                syn.classification_annotations(num=16), store, **mk
            )
        loaders[key] = DataLoader(ds, batch_size=min(t.batch_size, 4), seed=0)
    return loaders


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from vilbert_tpu.utils.cache import setup_tpu_defaults

    setup_tpu_defaults()

    from vilbert_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(
        coordinator_address=args.coordinator or None,
        num_processes=args.num_processes or None,
        process_id=args.process_id if args.process_id >= 0 else None,
    )
    import jax

    from vilbert_tpu.core.config import (
        ModelConfig, OptimizerConfig, TrainConfig, load_task_configs,
    )
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    model_cfg = ModelConfig.from_json_file(
        args.config,
        task_specific_tokens=args.task_specific_tokens,
        dynamic_attention=args.dynamic_attention,
        use_pallas_attention=args.use_pallas,
        model="roberta" if "roberta" in args.bert_model else "bert",
    )
    all_tasks = load_task_configs(args.tasks_yml)
    selected = {f"TASK{n}": all_tasks[f"TASK{n}"] for n in args.tasks.split("-")}

    if args.synthetic:
        loaders, val_loaders = _synthetic_world(selected, model_cfg.vocab_size), {}
    else:
        from vilbert_tpu.data.loading import load_datasets
        from vilbert_tpu.data.tokenization import load_tokenizer

        tokenizer = load_tokenizer(args.vocab or None, model_cfg.vocab_size)
        loaders, val_loaders = load_datasets(
            selected, tokenizer, seed=args.seed,
            grad_accum=args.gradient_accumulation_steps,
            shard_id=jax.process_index(), num_shards=jax.process_count(),
            clean_train_sets=args.clean_train_sets,
        )

    if args.save_name:
        # run directory named like the reference's timeStamp
        # (train_tasks.py:253-261: tasks + config stem + "-" + save_name)
        args.output_dir = os.path.join(
            args.output_dir,
            "-".join(sorted(selected))
            + "_" + os.path.splitext(os.path.basename(args.config))[0]
            + "-" + args.save_name,
        )

    freeze = freeze_prefixes(args.freeze)
    opt_cfg = OptimizerConfig(
        name=args.optim,
        learning_rate=args.learning_rate or min(t.lr for t in selected.values()),
        schedule=args.lr_scheduler,
        warmup_proportion=args.warmup_proportion,
        head_lr=args.head_lr,
        vision_scratch=args.vision_scratch,
        # reference multi-task AdamW runs WITHOUT bias correction
        # (train_tasks.py:425: AdamW(..., correct_bias=False));
        # --adam_correct_bias opts back in for from-scratch runs
        correct_bias=args.adam_correct_bias,
        grad_clip_norm=args.clip_grad_norm or None,
        first_moment_dtype="bfloat16" if args.bf16_adam_state else "float32",
        second_moment_dtype="bfloat16" if args.bf16_adam_state else "float32",
    )
    # data-parallel mesh over every device of every process; None keeps the
    # single-chip fast path (no resharding overhead)
    mesh = None
    if jax.process_count() > 1 or len(jax.devices()) > 1:
        from vilbert_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    trainer = MultiTaskTrainer(
        model_cfg, selected, loaders,
        opt_cfg=opt_cfg,
        train_cfg=TrainConfig(
            freeze_prefix=freeze,
            train_iter_gap=args.train_iter_gap,
            train_iter_multiplier=args.train_iter_multiplier,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            grad_dtype="bfloat16" if args.bf16_grads else "",
            checkpoint_dir=f"{args.output_dir}/ckpt"),
        val_loaders=val_loaders,
        seed=args.seed,
        num_train_epochs=args.num_epochs,
        model_family="basebert" if args.baseline else "vilbert",
        from_pretrained=args.from_pretrained,
        mesh=mesh,
    )
    trainer.attach_logger(f"{args.output_dir}/logs")
    if args.resume_file:
        step = trainer.restore_checkpoint(directory=args.resume_file)
        logging.info("resumed from %s at step %d (epoch %d)",
                     args.resume_file, step, trainer.epoch)
    state = trainer.train(args.num_epochs, eval_cadence=args.eval_cadence)

    from vilbert_tpu.core.checkpoint import save_params

    save_params(f"{args.output_dir}/params_final.npz", state.params)
    logging.info("saved %s/params_final.npz", args.output_dir)


if __name__ == "__main__":
    main()
