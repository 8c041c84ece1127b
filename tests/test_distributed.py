"""Multi-host execution: 2-process CPU cluster training in lockstep.

The TPU equivalent of the reference's torch.distributed NCCL path
(train_tasks.py:269-278, per-rank shards train_concap.py:290-294):
jax.distributed.initialize + per-process loader shards +
make_array_from_process_local_data. Here: two subprocesses, one CPU device
each, forming a 2-device data-parallel mesh over DCN(grpc).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass  # newer jax picks a default cross-process CPU impl

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, sys.argv[4])

from vilbert_tpu.parallel.distributed import initialize_distributed

initialize_distributed(f"localhost:{port}", nprocs, pid)
assert jax.process_count() == nprocs, jax.process_count()

import numpy as np

from vilbert_tpu.core.config import ModelConfig, OptimizerConfig
from vilbert_tpu.train.pretrain import run_pretraining

cfg = ModelConfig(
    vocab_size=64, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=32,
    v_feature_size=16, v_hidden_size=32, v_num_hidden_layers=1,
    v_num_attention_heads=4, v_intermediate_size=32, v_target_size=8,
    bi_hidden_size=32, bi_num_attention_heads=4,
    v_biattention_id=(0,), t_biattention_id=(1,),
    compute_dtype="float32",
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
)

GLOBAL_BATCH, SEQ, REG = 4, 8, 5
rng = np.random.RandomState(0)  # SAME data on every process
def make_batch(step):
    r = np.random.RandomState(100 + step)
    full = {
        "input_ids": r.randint(1, cfg.vocab_size, (GLOBAL_BATCH, SEQ)).astype(np.int32),
        "image_feat": r.randn(GLOBAL_BATCH, REG, cfg.v_feature_size).astype(np.float32),
        "image_loc": r.rand(GLOBAL_BATCH, REG, 5).astype(np.float32),
        "segment_ids": np.zeros((GLOBAL_BATCH, SEQ), np.int32),
        "input_mask": np.ones((GLOBAL_BATCH, SEQ), np.int32),
        "image_mask": np.ones((GLOBAL_BATCH, REG), np.int32),
        "lm_label_ids": np.where(
            r.rand(GLOBAL_BATCH, SEQ) < 0.3,
            r.randint(1, cfg.vocab_size, (GLOBAL_BATCH, SEQ)), -1
        ).astype(np.int32),
        "image_label": np.full((GLOBAL_BATCH, REG - 1), -1, np.int32),
        "image_target": np.ones(
            (GLOBAL_BATCH, REG - 1, cfg.v_target_size), np.float32
        ) / cfg.v_target_size,
        "is_next": np.zeros((GLOBAL_BATCH,), np.int32),
    }
    # this process's contiguous shard (reference per-rank shard math)
    lo = pid * (GLOBAL_BATCH // nprocs)
    hi = lo + GLOBAL_BATCH // nprocs
    return {k: v[lo:hi] for k, v in full.items()}

loader = [make_batch(s) for s in range(3)]
state = run_pretraining(
    cfg, OptimizerConfig(learning_rate=1e-3, schedule="constant"),
    loader, num_steps=3, seed=0, log_every=0,
)
loss_like = float(np.asarray(jax.device_get(state.params["bert"]["embeddings"]["word_embeddings"]["embedding"])).sum())
print(f"FINAL {loss_like:.6f}", flush=True)

# grad-accum on multi-host: per-host [grad_accum, B_local//ga, ...] shards
# assembled on microbatch axis 1 (make_global_batch batch_axis=1)
state2 = run_pretraining(
    cfg, OptimizerConfig(learning_rate=1e-3, schedule="constant"),
    loader, num_steps=3, seed=0, log_every=0, grad_accum=2,
)
loss_like2 = float(np.asarray(jax.device_get(state2.params["bert"]["embeddings"]["word_embeddings"]["embedding"])).sum())
print(f"FINAL2 {loss_like2:.6f}", flush=True)

# --- multitask trainer x grad accum on the multi-host mesh -----------------
# (reference composes DDP + --gradient_accumulation_steps freely,
# train_tasks.py:537-541; per-host micro shards assemble on axis 1)
from vilbert_tpu.core.config import TaskConfig, TrainConfig
from vilbert_tpu.parallel.mesh import make_mesh
from vilbert_tpu.train.multitask import MultiTaskTrainer

B_GLOBAL = 4

def task_batch(step, kind):
    r = np.random.RandomState(200 + step * 7 + (0 if kind == "vqa" else 1))
    full = {
        "question": r.randint(1, cfg.vocab_size, (B_GLOBAL, SEQ)).astype(np.int32),
        "features": r.randn(B_GLOBAL, REG, cfg.v_feature_size).astype(np.float32),
        "spatials": r.rand(B_GLOBAL, REG, 5).astype(np.float32),
        "segment_ids": np.zeros((B_GLOBAL, SEQ), np.int32),
        "input_mask": np.ones((B_GLOBAL, SEQ), np.int32),
        "image_mask": np.ones((B_GLOBAL, REG), np.int32),
        "target": (r.rand(B_GLOBAL, 13).astype(np.float32) if kind == "vqa"
                   else r.randint(0, 3, (B_GLOBAL,)).astype(np.int32)),
    }
    lo = pid * (B_GLOBAL // nprocs)
    hi = lo + B_GLOBAL // nprocs
    return {k: v[lo:hi] for k, v in full.items()}

class Loader:
    def __init__(self, batches):
        self.batches = batches
        self.batch_size = B_GLOBAL // nprocs
    def __iter__(self):
        return iter(self.batches)
    def __len__(self):
        return len(self.batches)

tasks = {
    "TASK_A": TaskConfig(task_id=1, name="A", type="VL-classifier",
                         loss="BCEWithLogitLoss", batch_size=B_GLOBAL,
                         lr=4e-4, num_epoch=2, num_labels=13),
    "TASK_B": TaskConfig(task_id=2, name="B", type="VL-tri-classifier",
                         loss="CrossEntropyLoss", batch_size=B_GLOBAL,
                         lr=2e-4, num_epoch=2, num_labels=3),
}
loaders = {"TASK_A": Loader([task_batch(s, "vqa") for s in range(4)]),
           "TASK_B": Loader([task_batch(s, "tri") for s in range(4)])}
trainer = MultiTaskTrainer(
    cfg, tasks, loaders,
    opt_cfg=OptimizerConfig(learning_rate=2e-4, schedule="warmup_linear",
                            warmup_proportion=0.25, correct_bias=False),
    train_cfg=TrainConfig(gradient_accumulation_steps=2),
    num_labels=13, seed=0, mesh=make_mesh(), num_train_epochs=2,
    dropout_prob=0.0,
)
assert trainer.median_num_iter == 2, trainer.median_num_iter
for it in range(2):
    m = trainer.train_iteration(it)
    print(f"MT{it} {float(m['TASK_A']['loss']):.6f} "
          f"{float(m['TASK_B']['loss']):.6f}", flush=True)
"""


def _free_port():
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def test_two_process_cpu_training(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port), ROOT],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    # plus a single-process run of the same program: the multitask x
    # grad-accum trajectory must reproduce it (reference DDP + grad accum,
    # train_tasks.py:537-541)
    single = subprocess.Popen(
        [sys.executable, str(script), "0", "1", str(_free_port()), ROOT],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    outs = []
    for p in procs + [single]:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs + [single], outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    for tag in ("FINAL ", "FINAL2"):
        finals = [
            [ln for ln in out.splitlines() if ln.startswith(tag)][-1]
            for out in outs[:2]
        ]
        # both processes hold the same replicated params after 3 psum'd steps
        v0, v1 = (float(f.split()[1]) for f in finals)
        assert np.isfinite(v0) and abs(v0 - v1) < 1e-6, (tag, finals)

    def mt_losses(out):
        rows = [ln.split()[1:] for ln in out.splitlines()
                if ln.startswith("MT")]
        return np.asarray([[float(x) for x in r] for r in rows])

    mt0, mt1, mt_single = (mt_losses(o) for o in outs)
    assert mt0.shape == (2, 2), outs[0][-2000:]
    # lockstep: the two cluster processes compute the identical program
    np.testing.assert_allclose(mt0, mt1, atol=1e-6)
    # 2-process x grad-accum reproduces the single-process trajectory
    np.testing.assert_allclose(mt0, mt_single, rtol=2e-4, atol=1e-5)
