"""vilbert_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-and-language framework.

A ground-up rebuild of the capabilities of facebookresearch/vilbert-multi-task
(ViLBERT + 12-in-1 multi-task training) designed TPU-first:

- two-stream co-attentional transformer compiled with XLA, hot attention /
  layernorm paths available as fused Pallas TPU kernels (``vilbert_tpu.ops``),
- data parallelism expressed through ``jax.sharding.Mesh`` + ``pjit`` with
  gradient ``psum`` over ICI (``vilbert_tpu.parallel``) rather than NCCL DDP,
- bf16 compute / fp32 parameters instead of fp16 loss scaling,
- a host-side feature-store + masking pipeline feeding double-buffered device
  prefetch (``vilbert_tpu.data``) in place of tensorpack/ZMQ worker fleets.

Layer map (mirrors SURVEY.md §1 of the reference):
  core/      configs, rng, mesh, checkpointing, torch-checkpoint importer
  ops/       Pallas kernels + XLA reference implementations of hot ops
  models/    flax modules: two-stream encoder, heads, pretrain + VL-task models
  parallel/  mesh construction, sharded train-step builders, collectives
  data/      feature stores, tokenization, per-task datasets, prefetch
  train/     optimizers/schedules, multi-task driver, stop controllers, logging
  eval/      per-task evaluators, retrieval ranking, VCR tooling
  cli/       train_concap / train_tasks / eval_tasks / eval_retrieval
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (keeps bare `import vilbert_tpu` jax-free)."""
    top = {
        "ModelConfig": "vilbert_tpu.core.config",
        "TaskConfig": "vilbert_tpu.core.config",
        "OptimizerConfig": "vilbert_tpu.core.config",
        "TrainConfig": "vilbert_tpu.core.config",
        "load_task_configs": "vilbert_tpu.core.config",
        "ViLBERTForPretraining": "vilbert_tpu.models.vilbert",
        "ViLBERTForVLTasks": "vilbert_tpu.models.vilbert",
        "BertModel": "vilbert_tpu.models.vilbert",
        "MultiTaskTrainer": "vilbert_tpu.train.multitask",
        "run_pretraining": "vilbert_tpu.train.pretrain",
    }
    if name in top:
        import importlib

        return getattr(importlib.import_module(top[name]), name)
    raise AttributeError(f"module 'vilbert_tpu' has no attribute {name!r}")
