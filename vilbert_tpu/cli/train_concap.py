"""CLI: Conceptual Captions pretraining (mirrors reference train_concap.py).

Example:
  python -m vilbert_tpu.cli.train_concap \\
      --config configs/bert_base_6layer_6conect.json \\
      --train_store data/cc_train.vfr --captions data/caption_train.json \\
      --vocab data/vocab.txt --batch_size 512 --num_epochs 10

  # smoke test without data artifacts:
  python -m vilbert_tpu.cli.train_concap --synthetic --num_steps 10
"""

from __future__ import annotations

import argparse
import json
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/bert_base_6layer_6conect.json")
    p.add_argument("--train_store", default="", help=".vfr/.lmdb region features")
    p.add_argument("--captions", default="", help="caption json {image_id: text}")
    p.add_argument("--val_store", default="",
                   help="validation region features (enables the per-epoch "
                        "3-loss validation pass, reference "
                        "train_concap.py:608-654)")
    p.add_argument("--val_captions", default="", help="validation caption json")
    p.add_argument("--val_every", type=int, default=0,
                   help="steps between validation passes (0: once at end; "
                        "with --num_epochs, defaults to once per epoch)")
    p.add_argument("--vocab", default="", help="WordPiece vocab.txt")
    p.add_argument("--from_pretrained", default="", help="torch .bin or .npz params")
    p.add_argument("--output_dir", default="checkpoints/concap")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--num_steps", type=int, default=0, help="override step count")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--seq_len", type=int, default=36)
    p.add_argument("--region_len", type=int, default=36)
    p.add_argument("--img_weight", type=float, default=1.0)
    p.add_argument("--objective", type=int, default=0)
    p.add_argument("--visual_target", type=int, default=0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--pretrained_lr_scale", type=float, default=1.0,
                   help="lr multiplier for loaded BERT params (reference 0.1)")
    p.add_argument("--baseline", action="store_true",
                   help="pretrain the single-stream baseline "
                        "(reference train_concap.py:397-414)")
    p.add_argument("--adam_epsilon", type=float, default=1e-8,
                   help="AdamW epsilon (train_concap.py:225)")
    p.add_argument("--bf16_adam_state", action="store_true",
                   help="store Adam moments (m, v) in bfloat16 — halves "
                        "optimizer HBM state; accumulation stays fp32 "
                        "(docs/perf.md)")
    p.add_argument("--bf16_grads", action="store_true",
                   help="materialize gradients in bfloat16 (docs/perf.md)")
    p.add_argument("--num_negative", type=int, default=128,
                   help="NCE negatives for visual_target=2 (vilbert.py:1523)")
    p.add_argument("--freeze", type=int, default=-1,
                   help="freeze text embeddings + text layers 0..N "
                        "(train_concap.py:171-176; -1 = nothing)")
    p.add_argument("--dynamic_attention", action="store_true")
    p.add_argument("--bert_model", default="bert-base-uncased",
                   help="'roberta' selects RoBERTa embeddings "
                        "(train_concap.py:345-352)")
    p.add_argument("--without_coattention", action="store_true",
                   help="disable the co-attention blocks (vilbert.py:1055)")
    p.add_argument("--save_name", default="",
                   help="suffix for the run directory under output_dir")
    p.add_argument("--resume_file", default="",
                   help="orbax checkpoint dir to resume (params + opt state)")
    p.add_argument("--start_step", type=int, default=-1,
                   help="override the resume step (-1: from the checkpoint)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shard_id", type=int, default=-1,
                   help="-1 = this process's index (multi-host) or 0")
    p.add_argument("--num_shards", type=int, default=0,
                   help="0 = process count (multi-host) or 1")
    # multi-host runtime (reference torch.distributed --local_rank/NCCL env,
    # train_tasks.py:269-278). On TPU pod slices leave unset (auto-detect).
    p.add_argument("--coordinator", default="",
                   help="coordinator host:port for jax.distributed")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    p.add_argument("--lm_gather", type=int, default=-1,
                   help="project only K masked positions through the LM head "
                        "(-1: auto seq_len//3, 0: full sequence)")
    p.add_argument("--img_gather", type=int, default=0,
                   help="project only K masked regions through the image "
                        "head (0: all regions; ignored for visual_target=2). "
                        "Loss-identical when every sample has <= K masked "
                        "regions — size K against the 15%%-of-regions "
                        "selection distribution (IoU co-masking only zeroes "
                        "features; it never adds masked-label rows)")
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint each encoder block (large models)")
    p.add_argument("--num_workers", type=int, default=0,
                   help=">1: thread-pool host batch building (deterministic)")
    p.add_argument("--synthetic", action="store_true", help="synthetic data smoke run")
    p.add_argument("--checkpoint_every", type=int, default=0)
    return p


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

    if args.num_shards <= 0:
        args.num_shards = jax.process_count()
    if args.shard_id < 0:
        args.shard_id = jax.process_index()

    from vilbert_tpu.core.config import ModelConfig, OptimizerConfig
    from vilbert_tpu.data.concap import (
        CONCEPTUAL_CAPTIONS_TRAIN_SIZE,
        ConceptCapLoader,
        ConceptCapSampleConfig,
    )
    from vilbert_tpu.data.feature_store import (
        InMemoryFeatureStore, open_feature_store,
    )
    from vilbert_tpu.data.tokenization import load_tokenizer
    from vilbert_tpu.train.pretrain import run_pretraining

    model_cfg = ModelConfig.from_json_file(
        args.config,
        objective=args.objective,
        visual_target=args.visual_target,
        use_pallas_attention=args.use_pallas,
        remat=args.remat,
        num_negative=args.num_negative,
        dynamic_attention=args.dynamic_attention,
        with_coattention=not args.without_coattention,
        model="roberta" if "roberta" in args.bert_model else "bert",
    )
    if args.save_name:
        import os

        args.output_dir = os.path.join(args.output_dir, args.save_name)
    tokenizer = load_tokenizer(args.vocab or None, model_cfg.vocab_size)

    val_store = val_captions = None
    if args.synthetic:
        store = InMemoryFeatureStore.synthetic(num_images=256, num_boxes=36)
        captions = {k: f"a synthetic caption about image {k}" for k in store.keys()}
        dataset_size = 256
        val_store = InMemoryFeatureStore.synthetic(num_images=64, num_boxes=36)
        val_captions = {
            k: f"a synthetic validation caption {k}" for k in val_store.keys()
        }
    else:
        assert args.train_store and args.captions, "--train_store/--captions required"
        store = open_feature_store(args.train_store)
        captions = json.load(open(args.captions))
        dataset_size = len(store.keys())
        if args.val_store:
            assert args.val_captions, "--val_captions required with --val_store"
            val_store = open_feature_store(args.val_store)
            val_captions = json.load(open(args.val_captions))

    loader = ConceptCapLoader(
        store, captions, tokenizer,
        batch_size=args.batch_size // args.num_shards,
        cfg=ConceptCapSampleConfig(
            seq_len=args.seq_len, region_len=args.region_len,
            feature_dim=model_cfg.v_feature_size,
            target_dim=model_cfg.v_target_size,
            visual_target=args.visual_target, objective=args.objective,
        ),
        seed=args.seed, shard_id=args.shard_id, num_shards=args.num_shards,
        num_workers=args.num_workers,
    )

    val_loader = None
    if val_store is not None:
        val_loader = ConceptCapLoader(
            val_store, val_captions, tokenizer,
            batch_size=args.batch_size // args.num_shards,
            cfg=ConceptCapSampleConfig(
                seq_len=args.seq_len, region_len=args.region_len,
                feature_dim=model_cfg.v_feature_size,
                target_dim=model_cfg.v_target_size,
                visual_target=args.visual_target, objective=args.objective,
            ),
            seed=args.seed + 1,
            shard_id=args.shard_id, num_shards=args.num_shards,
        )

    steps_per_epoch = max(dataset_size // args.batch_size, 1)
    num_steps = args.num_steps or steps_per_epoch * args.num_epochs
    val_every = args.val_every
    if not val_every and not args.num_steps:
        # per-epoch validation, like the reference epoch loop
        val_every = steps_per_epoch
    opt_cfg = OptimizerConfig(
        learning_rate=args.learning_rate,
        warmup_proportion=args.warmup_proportion,
        schedule="warmup_linear",
        beta2=0.98,  # reference AdamW betas for concap (train_concap.py:467)
        eps=args.adam_epsilon,  # reference --adam_epsilon (train_concap.py:225)
        pretrained_lr_scale=args.pretrained_lr_scale,
        first_moment_dtype="bfloat16" if args.bf16_adam_state else "float32",
        second_moment_dtype="bfloat16" if args.bf16_adam_state else "float32",
    )

    init_params = None
    if args.from_pretrained:
        import jax

        from vilbert_tpu.core.checkpoint import load_params, load_pretrained_torch
        from vilbert_tpu.train.pretrain import _pretrain_model
        from vilbert_tpu.utils.cached_path import cached_path

        # URLs download into the local cache first (utils.py:485-682);
        # format dispatch keys on the ORIGINAL name — cache filenames are
        # extension-less content hashes
        is_npz = args.from_pretrained.split("?", 1)[0].endswith(".npz")
        args.from_pretrained = cached_path(args.from_pretrained)

        model = _pretrain_model(
            model_cfg, "basebert" if args.baseline else "vilbert"
        )
        batch0 = next(iter(loader))
        template = model.init(
            jax.random.PRNGKey(0), batch0["input_ids"], batch0["image_feat"],
            batch0["image_loc"],
        )["params"]
        if is_npz:
            init_params = load_params(args.from_pretrained)
        else:
            init_params, report = load_pretrained_torch(
                args.from_pretrained, template
            )
            logging.info("loaded %d params (%d missing, %d unexpected)",
                         len(report.loaded), len(report.missing),
                         len(report.unexpected))

    hooks = []
    if args.checkpoint_every:
        from vilbert_tpu.core.checkpoint import CheckpointManager

        mngr = CheckpointManager(f"{args.output_dir}/ckpt")

        def ckpt_hook(step, state, metrics):
            if (step + 1) % args.checkpoint_every == 0:
                # async: the disk write overlaps the next steps (orbax
                # stages device arrays to host before returning)
                mngr.save(step + 1, state, wait=False)

        hooks.append(ckpt_hook)

    from vilbert_tpu.cli.train_tasks import freeze_prefixes

    state = run_pretraining(
        model_cfg, opt_cfg, loader,
        num_steps=num_steps, seed=args.seed, img_weight=args.img_weight,
        grad_accum=args.gradient_accumulation_steps, init_params=init_params,
        lm_gather=(
            args.seq_len // 3 if args.lm_gather == -1 else args.lm_gather
        ),
        img_gather=args.img_gather,
        val_loader=val_loader, val_every=val_every,
        hooks=hooks,
        model_family="basebert" if args.baseline else "vilbert",
        freeze_prefix=freeze_prefixes(str(args.freeze)),
        resume_dir=args.resume_file,
        start_step=args.start_step,
        grad_dtype="bfloat16" if args.bf16_grads else "",
    )
    if args.checkpoint_every:
        mngr.mngr.wait_until_finished()  # drain pending async saves

    from vilbert_tpu.core.checkpoint import save_params

    save_params(f"{args.output_dir}/params_final.npz", state.params)
    logging.info("saved %s/params_final.npz", args.output_dir)


if __name__ == "__main__":
    main()
