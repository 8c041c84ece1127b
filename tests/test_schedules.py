"""LR scheduler family: values pinned against the reference formulas.

Reference: train_tasks.py:431-457 (construction), :548-573 (per-iteration
stepping), :595-605 (epoch-level stepping). The reference composes a
pytorch_transformers warmup scheduler with an epoch-level torch scheduler
over the same optimizer; HostLRScheduler reproduces the composition
host-side for the external-lr train step.
"""

import math

import numpy as np
import pytest

from vilbert_tpu.core.config import OptimizerConfig
from vilbert_tpu.train.optim import (
    EPOCH_SCHEDULES,
    HostLRScheduler,
    make_schedule,
)

BASE = 2e-5
TOTAL = 100  # iterations
WARMUP = 10  # 0.1 proportion


def sched(kind):
    s = make_schedule(
        OptimizerConfig(learning_rate=BASE, schedule=kind, warmup_proportion=0.1),
        BASE, TOTAL,
    )
    assert isinstance(s, HostLRScheduler)
    return s


class TestMannul:
    def test_warmup_ramp(self):
        s = sched("mannul")
        # step 0 quirk: the mannul LambdaLR is constructed AFTER the warmup
        # scheduler and _LRScheduler construction re-applies
        # lr = initial_lr * lambda(0), clobbering the warmup's 0 — verified
        # against torch: the first update of training runs at FULL base LR
        assert s(0) == pytest.approx(BASE)
        assert s(5) == pytest.approx(BASE * 0.5)
        assert s(WARMUP) == pytest.approx(BASE)
        assert s(50) == pytest.approx(BASE)  # warmup_constant holds

    def test_decay_at_5_and_7(self):
        # LambdaLR factor = 0.2**|{5,7} <= epoch| — after the END of epoch 4
        # the next epoch (5) trains at ×0.2; after epoch 6 ends, ×0.04
        # (train_tasks.py:439-457,:604-605)
        s = sched("mannul")
        for e in range(0, 4):
            s.on_epoch_end(e)
            assert s(50) == pytest.approx(BASE)
        s.on_epoch_end(4)
        assert s(50) == pytest.approx(BASE * 0.2)
        s.on_epoch_end(5)
        assert s(50) == pytest.approx(BASE * 0.2)
        s.on_epoch_end(6)
        assert s(50) == pytest.approx(BASE * 0.04)
        s.on_epoch_end(10)
        assert s(50) == pytest.approx(BASE * 0.04)

    def test_decay_composes_with_warmup(self):
        s = sched("mannul")
        s.on_epoch_end(4)
        assert s(5) == pytest.approx(BASE * 0.5 * 0.2)


class TestAutomatic:
    def test_plateau_reduce(self):
        # ReduceLROnPlateau(mode=max, factor=0.2, patience=1, cooldown=1,
        # threshold=0.001 rel): two consecutive non-improving epochs → ×0.2
        s = sched("automatic")
        s.on_epoch_end(0, 1.0)   # best=1.0
        s.on_epoch_end(1, 2.0)   # improves, best=2.0
        assert s(50) == pytest.approx(BASE)
        s.on_epoch_end(2, 2.0)   # bad 1 (needs > best*1.001)
        assert s(50) == pytest.approx(BASE)
        s.on_epoch_end(3, 1.9)   # bad 2 > patience → reduce + cooldown
        assert s(50) == pytest.approx(BASE * 0.2)
        s.on_epoch_end(4, 1.0)   # in cooldown: bad reset to 0
        assert s(50) == pytest.approx(BASE * 0.2)
        s.on_epoch_end(5, 1.0)   # bad 1
        s.on_epoch_end(6, 1.0)   # bad 2 → reduce again
        assert s(50) == pytest.approx(BASE * 0.04)

    def test_improvement_needs_rel_threshold(self):
        s = sched("automatic")
        s.on_epoch_end(0, 1.0)
        s.on_epoch_end(1, 1.0005)  # not > 1.0 * 1.001 → bad
        s.on_epoch_end(2, 1.0005)  # bad 2 → reduce
        assert s(50) == pytest.approx(BASE * 0.2)

    def test_no_step0_clobber(self):
        # ReduceLROnPlateau sets no LR at construction, so unlike the
        # LambdaLR family the warmup's 0 at step 0 survives
        s = sched("automatic")
        assert s(0) == 0.0


class TestCosine:
    def test_values(self):
        # annealer steps past warmup with T_max = total_steps
        s = sched("cosine")
        assert s(WARMUP) == pytest.approx(BASE)  # t=0 → cos(0)=1
        mid = WARMUP + TOTAL // 2
        assert s(mid) == pytest.approx(BASE * 0.5 * (1 + math.cos(math.pi * 0.5)))
        # at the final iteration the annealer has taken total-warmup steps
        t = TOTAL - WARMUP
        assert s(TOTAL) == pytest.approx(
            BASE * 0.5 * (1 + math.cos(math.pi * t / TOTAL))
        )

    def test_warm_restarts(self):
        s = sched("cosine_warm")
        # restarts when the annealer's step count wraps T_0 = total_steps
        assert s(WARMUP + TOTAL) == pytest.approx(BASE)  # t = T_0 → wraps to 0
        assert s(WARMUP + TOTAL + TOTAL // 2) == pytest.approx(
            BASE * 0.5 * (1 + math.cos(math.pi * 0.5))
        )


class TestPlumbing:
    def test_state_roundtrip(self):
        s = sched("mannul")
        s.on_epoch_end(6)
        s2 = sched("mannul")
        s2.load_state_dict(s.state_dict())
        assert s2(50) == s(50)

    def test_external_lr_required(self):
        import jax

        from vilbert_tpu.train.optim import build_optimizer

        params = {"w": np.zeros((2, 2), np.float32)}
        for kind in EPOCH_SCHEDULES:
            cfg = OptimizerConfig(learning_rate=BASE, schedule=kind)
            with pytest.raises(ValueError, match="external_lr"):
                build_optimizer(cfg, params, 100)
            tx, s = build_optimizer(cfg, params, 100, external_lr=True)
            assert isinstance(s, HostLRScheduler)
