"""MetricsLogger behaviors: txt records, running averages, state round-trip."""

import json
import os

import numpy as np


def test_logger_records_and_state(tmp_path):
    from vilbert_tpu.train.logger import MetricsLogger

    log = MetricsLogger(str(tmp_path), ["TASK1", "TASK2"], use_tensorboard=False)
    for step in range(4):
        log.step_train(step, "TASK1", loss=1.0 - 0.1 * step, score=0.5, lr=1e-4)
    log.step_train(0, "TASK2", loss=2.0, score=0.25)
    line = log.show_train(4)
    assert "TASK1" in line and "TASK2" in line
    log.step_val(4, "TASK1", loss=0.6, score=0.7)

    records = [json.loads(l) for l in open(os.path.join(str(tmp_path), "out.txt"))]
    assert any(r.get("split") == "val" and r["task"] == "TASK1" for r in records)
    assert any("summary" in r for r in records)

    # running totals survive a state round-trip (reference pickles the logger
    # inside checkpoints, utils.py:199-210)
    state = log.state_dict()
    log2 = MetricsLogger(str(tmp_path), ["TASK1", "TASK2"], use_tensorboard=False)
    log2.load_state_dict(state)
    assert log2.task_step_total["TASK1"] == 4
    np.testing.assert_allclose(
        log2.task_loss_total["TASK1"], 1.0 + 0.9 + 0.8 + 0.7
    )
    log.close()
    log2.close()


def test_logger_tmp_averages_reset(tmp_path):
    from vilbert_tpu.train.logger import MetricsLogger

    log = MetricsLogger(str(tmp_path), ["T"], use_tensorboard=False)
    log.step_train(0, "T", loss=1.0, score=1.0)
    log.show_train(1)
    assert log.task_step_tmp["T"] == 0
    assert log.task_loss_tmp["T"] == 0.0
    assert log.task_step_total["T"] == 1
    log.close()
