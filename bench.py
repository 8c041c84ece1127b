"""Headline benchmark: Conceptual Captions pretraining throughput.

Measures samples/sec/chip for a full training step (forward + 3 losses +
backward + adamw update) of ViLBERT ``bert_base_6layer_6conect`` at the
reference's CC shapes (seq 36, 36 regions + global row; reference
train_concap.py batch 512 global), bf16 compute / fp32 params, on the
available accelerator.

Baseline: the reference publishes no benchmark numbers (BASELINE.md). The
``vs_baseline`` ratio is computed against an estimated reference throughput of
REFERENCE_SAMPLES_PER_SEC_PER_CHIP on its era-typical hardware (V100, fp16
apex): ~53 GFLOPs/sample (6·N·tokens over the three streams) at ~25% MFU of
125 TFLOP/s peak ≈ 590 samples/s theoretical, derated ×0.25 for the
reference's measured inefficiencies (always-on anomaly detection
train_tasks.py:512, 7 always-computed heads, DataParallel scatter/gather,
python data layer) → 150 samples/s/chip. BASELINE.json's target is 3× that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC_PER_CHIP = 150.0

BATCH = 256          # per chip; reference global batch 512 over 8 GPUs = 64/GPU
SEQ = 36
REGIONS = 37         # 36 + global feature row
WARMUP_STEPS = 3
MEASURE_STEPS = 30


def bench_vqa_eval(no_head_major: bool = False, int8: bool = False,
                   int8_static: bool = False) -> None:
    """Secondary metric (BASELINE.json): VQA eval questions/sec — jitted
    vil_prediction forward at the reference eval shapes (seq 23, 101 regions,
    eval batch 1024 per vilbert_tasks.yml TASK1). Run: python bench.py --eval
    [--int8 | --int8_static] (ops/quant.py — v5e int8 MXU is 2x bf16;
    static = calibrated per-channel activation scales, no per-call abs-max)"""
    import jax

    from vilbert_tpu.core.config import ModelConfig
    from vilbert_tpu.models.vilbert import ViLBERTForVLTasks
    from vilbert_tpu.utils.cache import setup_tpu_defaults

    setup_tpu_defaults()
    cfg = ModelConfig.from_json_file(
        "configs/bert_base_6layer_6conect.json", compute_dtype="bfloat16",
        head_major_attention=not no_head_major, int8_matmul=int8,
        int8_static=int8_static,
    )
    model = ViLBERTForVLTasks(cfg)
    B, T, R = 1024, 23, 101
    rng = np.random.RandomState(0)
    q = rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32)
    feats = rng.randn(B, R, 2048).astype(np.float32)
    spats = rng.rand(B, R, 5).astype(np.float32)
    masks = (np.ones((B, T), np.int32), np.ones((B, R), np.int32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), q[:2], feats[:2], spats[:2])

    quant = {}
    if int8_static:
        # offline calibration: one mutable pass over a calibration batch
        # records each site's per-channel activation abs-max
        calib = jax.jit(
            lambda p, *a: model.apply(
                p, *a, heads=("vil_prediction",), mutable=["quant"]
            )[1]
        )
        quant = calib(
            params, q[:64], feats[:64], spats[:64], None,
            masks[0][:64], masks[1][:64],
        )["quant"]
        params = {**params, "quant": quant}

    @jax.jit
    def forward(params, q, feats, spats, tmask, imask):
        out = model.apply(params, q, feats, spats, None, tmask, imask,
                          heads=("vil_prediction",))
        return out.vil_prediction

    args = tuple(map(jax.device_put, (q, feats, spats, *masks)))
    out = forward(params, *args)
    float(out.sum())  # force
    t0 = time.perf_counter()
    steps = 20
    for _ in range(steps):
        out = forward(params, *args)
    float(out.sum())
    dt = time.perf_counter() - t0
    qps = B * steps / dt / jax.device_count()
    suffix = "_int8" if int8 else ("_int8_static" if int8_static else "")
    print(json.dumps({
        "metric": "vqa_eval_questions_per_sec_per_chip" + suffix,
        "value": round(qps, 2), "unit": "questions/s/chip",
        "vs_baseline": round(qps / 800.0, 3),  # est. reference V100 eval q/s
    }))


def _bench_model_cfg():
    from vilbert_tpu.core.config import ModelConfig

    return ModelConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, v_feature_size=2048, v_target_size=1601,
        v_hidden_size=1024, v_num_hidden_layers=6, v_num_attention_heads=8,
        v_intermediate_size=1024, bi_hidden_size=1024, bi_num_attention_heads=8,
        v_biattention_id=(0, 1, 2, 3, 4, 5), t_biattention_id=(6, 7, 8, 9, 10, 11),
        compute_dtype="bfloat16",
    )


def _e2e_artifacts(num_images: int = 512, vocab_words: int = 2000):
    """Build (once, cached in /tmp) a real VFR store + WordPiece vocab at CC
    shapes: 36 boxes × 2048-d features + 1601-d soft targets per image."""
    import os

    from vilbert_tpu.data.feature_store import (
        RegionFeatures, VrfFeatureStore, VrfWriter,
    )

    vfr = f"/tmp/bench_cc_{num_images}.vfr"
    vocab = "/tmp/bench_vocab.txt"
    if not os.path.exists(vocab):
        words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
            f"word{i}" for i in range(vocab_words)
        ]
        with open(vocab, "w") as f:
            f.write("\n".join(words) + "\n")
    if not os.path.exists(vfr):
        rng = np.random.RandomState(0)
        with VrfWriter(vfr) as w:
            for i in range(num_images):
                n, wpx, hpx = 36, 640, 480
                x1 = rng.uniform(0, wpx / 2, n)
                y1 = rng.uniform(0, hpx / 2, n)
                boxes = np.stack(
                    [x1, y1, x1 + rng.uniform(32, wpx / 2, n),
                     y1 + rng.uniform(32, hpx / 2, n)], 1,
                ).astype(np.float32)
                target = rng.rand(n, 1601).astype(np.float32)
                target /= target.sum(-1, keepdims=True)
                w.add(str(i), RegionFeatures(
                    features=rng.randn(n, 2048).astype(np.float32),
                    boxes=boxes, image_h=hpx, image_w=wpx, target=target,
                ))
    rng = np.random.RandomState(1)
    captions = {
        str(i): " ".join(
            f"word{rng.randint(vocab_words)}"
            for _ in range(int(rng.randint(6, 18)))
        )
        for i in range(num_images)
    }
    return VrfFeatureStore(vfr), captions, vocab


def bench_e2e(num_workers: int = 0) -> None:
    """End-to-end CC pretraining: VFR store → WordPiece tokenizer → masking →
    device prefetch → train step (the host path bench's headline number
    skips). Run: python bench.py --e2e [--workers N]."""
    import jax

    from vilbert_tpu.core.config import OptimizerConfig
    from vilbert_tpu.data.concap import ConceptCapLoader, ConceptCapSampleConfig
    from vilbert_tpu.data.prefetch import device_prefetch, repeat_iterator
    from vilbert_tpu.data.tokenization import WordPieceTokenizer
    from vilbert_tpu.models.vilbert import ViLBERTForPretraining
    from vilbert_tpu.parallel.train_step import TrainState, make_train_step
    from vilbert_tpu.train.optim import build_optimizer
    from vilbert_tpu.train.pretrain import make_pretrain_loss_fn
    from vilbert_tpu.utils.cache import setup_tpu_defaults

    setup_tpu_defaults()
    cfg = _bench_model_cfg()
    store, captions, vocab = _e2e_artifacts()
    loader = ConceptCapLoader(
        store, captions, WordPieceTokenizer(vocab), batch_size=BATCH,
        cfg=ConceptCapSampleConfig(), seed=0, num_workers=num_workers,
    )

    from vilbert_tpu.data.prefetch import compress_for_transfer

    model = ViLBERTForPretraining(cfg)
    stream = device_prefetch(
        repeat_iterator(lambda: iter(loader)), size=3,
        transform=lambda b: compress_for_transfer(
            {k: v for k, v in b.items() if k != "image_id"}, cfg.compute_dtype,
            raw_feature_targets=cfg.visual_target != 0,
        ),
    )
    first = next(stream)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), first["input_ids"], first["image_feat"],
        first["image_loc"],
    )["params"]
    tx, _ = build_optimizer(
        OptimizerConfig(learning_rate=1e-4, schedule="constant"), params, 1000
    )
    state = TrainState.create(params, tx)
    step_fn = make_train_step(
        make_pretrain_loss_fn(model, cfg, lm_gather=SEQ // 3), tx
    )

    key = jax.random.PRNGKey(0)
    batch = first
    for _ in range(WARMUP_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        batch = next(stream)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        batch = next(stream)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    rate = BATCH * MEASURE_STEPS / dt / jax.device_count()
    print(json.dumps({
        "metric": "cc_pretrain_e2e_samples_per_sec_per_chip",
        "value": round(rate, 2), "unit": "samples/s/chip",
        "vs_baseline": round(rate / REFERENCE_SAMPLES_PER_SEC_PER_CHIP, 3),
    }))


def main(config_json: str = "", batch: int = 0, remat: bool = False,
         metric_suffix: str = "", lm_gather: int = SEQ // 3,
         img_gather: int = 0,
         fused_qkv: bool = False, fp32_softmax: bool = False,
         no_head_major: bool = False,
         first_moment_dtype: str = "float32",
         second_moment_dtype: str = "float32",
         grad_dtype: str = "", proj_impl: str | None = None,
         gelu_impl: str | None = None,
         dropout_hash: str | None = None) -> None:
    import jax

    from vilbert_tpu.utils.cache import setup_tpu_defaults

    setup_tpu_defaults()

    from vilbert_tpu.core.config import ModelConfig, OptimizerConfig
    from vilbert_tpu.models.vilbert import ViLBERTForPretraining
    from vilbert_tpu.parallel.train_step import TrainState, make_train_step
    from vilbert_tpu.train.optim import build_optimizer
    from vilbert_tpu.train.pretrain import make_pretrain_loss_fn

    global BATCH
    if batch:
        BATCH = batch
    if config_json:
        cfg = ModelConfig.from_json_file(
            config_json, compute_dtype="bfloat16", remat=remat
        )
    else:
        cfg = _bench_model_cfg()
    import dataclasses

    if remat:
        cfg = dataclasses.replace(cfg, remat=True)
    if fused_qkv:  # measured slower (docs/perf.md); A/B knob
        cfg = dataclasses.replace(cfg, fused_qkv=True)
    if fp32_softmax:  # A/B knob: default is "auto" (= bf16 here)
        cfg = dataclasses.replace(cfg, softmax_dtype="float32")
    if no_head_major:  # A/B knob: default is head-major [B,h,S,d] attention
        cfg = dataclasses.replace(cfg, head_major_attention=False)
    # A/B knobs below use a None sentinel for "flag not passed" so an
    # explicit CLI value always wins, even over a config_json that sets a
    # non-default (ADVICE r4: comparing against the default string made
    # `--gelu auto` a silent no-op on such configs).
    if proj_impl is not None:  # projection spelling (docs/perf.md)
        cfg = dataclasses.replace(cfg, proj_impl=proj_impl)
    if gelu_impl is not None:  # "exact" forces XLA's erf expansion
        cfg = dataclasses.replace(cfg, gelu_impl=gelu_impl)
    if dropout_hash is not None:  # 2-mult hash (docs/perf.md)
        cfg = dataclasses.replace(cfg, dropout_hash=dropout_hash)
    model = ViLBERTForPretraining(cfg)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, (BATCH, SEQ)).astype(np.int32),
        "image_feat": rng.randn(BATCH, REGIONS, 2048).astype(np.float32),
        "image_loc": rng.rand(BATCH, REGIONS, 5).astype(np.float32),
        "segment_ids": np.zeros((BATCH, SEQ), np.int32),
        "input_mask": np.ones((BATCH, SEQ), np.int32),
        "image_mask": np.ones((BATCH, REGIONS), np.int32),
        "lm_label_ids": np.where(
            rng.rand(BATCH, SEQ) < 0.15, rng.randint(0, cfg.vocab_size, (BATCH, SEQ)), -1
        ).astype(np.int32),
        "image_label": np.where(rng.rand(BATCH, REGIONS - 1) < 0.15, 1, -1).astype(
            np.int32
        ),
        "image_target": rng.rand(BATCH, REGIONS - 1, cfg.v_target_size).astype(
            np.float32
        ),
        "is_next": rng.randint(0, 2, (BATCH,)).astype(np.int32),
    }
    batch["image_target"] /= batch["image_target"].sum(-1, keepdims=True)

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, batch["input_ids"], batch["image_feat"], batch["image_loc"]
    )["params"]
    tx, _ = build_optimizer(
        OptimizerConfig(learning_rate=1e-4, schedule="constant",
                        first_moment_dtype=first_moment_dtype,
                        second_moment_dtype=second_moment_dtype),
        params, 1000,
    )
    state = TrainState.create(params, tx)
    loss_fn = make_pretrain_loss_fn(
        model, cfg, lm_gather=lm_gather, img_gather=img_gather
    )
    step_fn = make_train_step(loss_fn, tx, grad_dtype=grad_dtype or None)

    batch = jax.tree.map(jax.device_put, batch)

    for i in range(WARMUP_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
    # NOTE: fetch the scalar, don't trust block_until_ready — on relayed
    # PJRT backends it can return before the chain actually executes.
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
    final_loss = float(metrics["loss"])  # forces the whole step chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    n_chips = jax.device_count()
    samples_per_sec_per_chip = BATCH * MEASURE_STEPS / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "cc_pretrain_samples_per_sec_per_chip" + metric_suffix,
                "value": round(samples_per_sec_per_chip, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(
                    samples_per_sec_per_chip / REFERENCE_SAMPLES_PER_SEC_PER_CHIP, 3
                ),
            }
        )
    )


def bench_multitask() -> None:
    """12-in-1 multi-task training throughput (BASELINE.json's first metric).

    One round-robin iteration over three flagship tasks covering the three
    distinct compile units / process modes of the recipe (tasks.yml shapes):
    VQA (normal, [128, 23, 101]), VCR Q->A (expand 4 options, [64, 60, 101]),
    NLVR2 (pair split, [64, 40, 101]) — per-task compiled steps with the
    reference's external-LR semantics, exactly the production
    MultiTaskTrainer path. Reports aggregate dataset-samples/s/chip.
    Run: python bench.py --multitask [--config <json>] [--scale N]

    ``scale`` divides every per-task batch size (CPU smoke: --scale 32)."""
    import sys

    import jax

    from vilbert_tpu.utils.cache import setup_tpu_defaults

    setup_tpu_defaults()

    from vilbert_tpu.core.config import (
        ModelConfig, OptimizerConfig, TaskConfig,
    )
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    config_json = (sys.argv[sys.argv.index("--config") + 1]
                   if "--config" in sys.argv
                   else "configs/bert_base_6layer_6conect.json")
    scale = (int(sys.argv[sys.argv.index("--scale") + 1])
             if "--scale" in sys.argv else 1)
    cfg = ModelConfig.from_json_file(
        config_json, compute_dtype="bfloat16", task_specific_tokens=True,
    )
    rng = np.random.RandomState(0)

    def mk_batch(B, T, R, process, num_labels):
        b = {
            "features": rng.randn(B, R, 2048).astype(np.float32),
            "spatials": rng.rand(B, R, 5).astype(np.float32),
            "image_mask": np.ones((B, R), np.int32),
            "question": rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "segment_ids": np.zeros((B, T), np.int32),
        }
        if process == "expand":  # 4 answer options share one image
            for k in ("question", "input_mask", "segment_ids"):
                b[k] = np.repeat(b[k][:, None], 4, axis=1)
            b["target"] = rng.randint(0, 4, (B,)).astype(np.int32)
        elif process == "nlvr":  # image pair in 2R rows
            for k in ("features", "spatials"):
                b[k] = np.concatenate([b[k], b[k]], axis=1)
            b["image_mask"] = np.ones((B, 2 * b["image_mask"].shape[1]), np.int32)
            b["target"] = rng.randint(0, 2, (B,)).astype(np.int32)
        else:
            t = rng.rand(B, num_labels).astype(np.float32)
            b["target"] = (t == t.max(-1, keepdims=True)).astype(np.float32)
        return b

    class Loader:
        def __init__(self, batch, n=64):
            self.batch, self.n = batch, n
            self.batch_size = batch["question"].shape[0]

        def __iter__(self):
            return iter([self.batch] * self.n)

        def __len__(self):
            return self.n

    tasks = {
        "TASK1": TaskConfig(task_id=1, name="VQA", type="VL-classifier",
                            loss="BCEWithLogitLoss", process="normal",
                            batch_size=128, lr=4e-5, num_epoch=20,
                            num_labels=3129),
        "TASK5": TaskConfig(task_id=5, name="VCR_Q-A", type="VL-logit",
                            loss="CrossEntropyLoss", process="expand",
                            batch_size=64, lr=2e-5, num_epoch=10),
        "TASK12": TaskConfig(task_id=12, name="NLVR2",
                             type="VL-binary-classifier",
                             loss="CrossEntropyLoss", process="nlvr",
                             batch_size=64, lr=2e-5, num_epoch=20),
    }
    loaders = {
        "TASK1": Loader(mk_batch(max(128 // scale, 2), 23, 101, "normal", 3129)),
        "TASK5": Loader(mk_batch(max(64 // scale, 2), 60, 101, "expand", 0)),
        "TASK12": Loader(mk_batch(max(64 // scale, 2), 40, 101, "nlvr", 0)),
    }
    trainer = MultiTaskTrainer(
        cfg, tasks, loaders,
        opt_cfg=OptimizerConfig(
            learning_rate=2e-5, schedule="warmup_linear",
            warmup_proportion=0.1, head_lr=1e-4, correct_bias=False,
        ),
        num_labels=3129,
    )
    samples_per_iter = sum(l.batch_size for l in loaders.values())

    for it in range(WARMUP_STEPS):
        metrics = trainer.train_iteration(it)
    for m in metrics.values():  # force the chains (see module docstring)
        float(m["loss"])

    t0 = time.perf_counter()
    for it in range(WARMUP_STEPS, WARMUP_STEPS + MEASURE_STEPS):
        metrics = trainer.train_iteration(it)
    losses = {k: float(m["loss"]) for k, m in metrics.items()}
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in losses.values()), losses

    rate = samples_per_iter * MEASURE_STEPS / dt / jax.device_count()
    print(json.dumps({
        "metric": "multitask_12in1_samples_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(rate / REFERENCE_SAMPLES_PER_SEC_PER_CHIP, 3),
    }))


def _device_init_watchdog(budget_s: float = 900.0) -> None:
    """Fail FAST (with a diagnosable message) instead of hanging forever.

    On this box the TPU is a remote PJRT tunnel; when the tunnel is down the
    first jax.devices() blocks indefinitely inside make_c_api_client (observed
    2026-08-17). A daemon timer hard-exits if the backend doesn't come up
    within the budget so the driver records a clear failure, not a timeout."""
    import os
    import sys
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(budget_s):
            sys.stderr.write(
                f"bench: device backend failed to initialize within "
                f"{budget_s:.0f}s — TPU tunnel down? aborting\n"
            )
            sys.stderr.flush()
            os._exit(17)

    threading.Thread(target=watch, daemon=True).start()

    import jax

    # honor an explicit CPU choice (some PJRT plugins ignore the env var —
    # programmatic config is the only restriction that sticks); accelerator
    # env values resolve through the plugin's own registration
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    jax.devices()  # blocks here iff the tunnel is down
    done.set()


if __name__ == "__main__":
    import sys

    _device_init_watchdog()

    def _arg(flag, default=0):
        return (int(sys.argv[sys.argv.index(flag) + 1])
                if flag in sys.argv else default)

    def _sarg(flag, default=""):
        return (sys.argv[sys.argv.index(flag) + 1]
                if flag in sys.argv else default)

    if "--eval" in sys.argv:
        bench_vqa_eval(no_head_major="--no_head_major" in sys.argv,
                       int8="--int8" in sys.argv,
                       int8_static="--int8_static" in sys.argv)
    elif "--multitask" in sys.argv:
        bench_multitask()
    elif "--e2e" in sys.argv:
        bench_e2e(num_workers=_arg("--workers"))
    elif "--large" in sys.argv:
        main(config_json="configs/bert_large_6layer_6conect.json",
             batch=_arg("--batch", 128), remat="--remat" in sys.argv,
             metric_suffix="_large",
             lm_gather=_arg("--lm_gather", SEQ // 3),
             img_gather=_arg("--img_gather", 0),
             no_head_major="--no_head_major" in sys.argv,
             first_moment_dtype=("bfloat16" if "--bf16_mu" in sys.argv
                                 else "float32"),
             second_moment_dtype=("bfloat16" if "--bf16_nu" in sys.argv
                                  else "float32"),
             grad_dtype=("bfloat16" if "--bf16_grads" in sys.argv else ""),
             proj_impl=_sarg("--proj_impl", None),
             gelu_impl=_sarg("--gelu", None),
             dropout_hash=_sarg("--dropout_hash", None))
    else:
        main(batch=_arg("--batch"), remat="--remat" in sys.argv,
             lm_gather=_arg("--lm_gather", SEQ // 3),
             img_gather=_arg("--img_gather", 0),
             fused_qkv="--fused_qkv" in sys.argv,
             fp32_softmax="--fp32_softmax" in sys.argv,
             no_head_major="--no_head_major" in sys.argv,
             first_moment_dtype=("bfloat16" if "--bf16_mu" in sys.argv
                                 else "float32"),
             second_moment_dtype=("bfloat16" if "--bf16_nu" in sys.argv
                                  else "float32"),
             grad_dtype=("bfloat16" if "--bf16_grads" in sys.argv else ""),
             proj_impl=_sarg("--proj_impl", None),
             gelu_impl=_sarg("--gelu", None),
             dropout_hash=_sarg("--dropout_hash", None))
