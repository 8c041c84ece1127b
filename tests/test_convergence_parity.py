"""Convergence-level equivalence: a FULL tiny multi-task training run on
both stacks — warmup, LR-drop epochs {5,7} with controller resets, the
reference eval cadence, and stop-controller in_stop transitions driven by
real val scores — must produce matching val-score trajectories, matching
controller state transitions at the same evals, and a matching final score.

This is the top of the parity pyramid (above the 20/30-step trajectory
tests in test_training_parity.py): it exercises the epoch-level machinery
of the reference train loop (train_tasks.py:510-637) end to end —

- mannul LR schedule: LambdaLR x0.2**|{5,7} <= epoch| stepped at epoch end
  (train_tasks.py:437-457,:601-605), composed with WarmupConstantSchedule
  stepped after the FIRST trained task while global_step < warmup_steps
  (:548-556), including the construction-order quirk (the epoch scheduler
  clobbers the warmup's step-0 LR back to base);
- per-task eval each time a task wraps its train loader
  (iterId % task_num_iters == 0, :583-599) + final-step eval;
- MultiTaskStopOnPlateau (mode=max, patience=1, cooldown=1, threshold=1e-3,
  continue_threshold=5e-3, train_tasks.py:341-349) gating stopped tasks to
  every train_iter_gap-th GLOBAL iterId (:514-521), reset on LR-drop epochs
  (:606-610);
- and the same run again with gradient_accumulation_steps=2 and with
  task_specific_tokens=True.

The torch side uses the ACTUAL reference MultiTaskStopOnPlateau
(vilbert/utils.py:39-148, imported as oracle) and the reference
VILBertForVLTasks; the loop below mirrors train_tasks.py line by line.
Data is synthetic but carries a learnable linear signal so val scores MOVE
(rise, then plateau -> real in_stop transitions).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_loader import (
    load_reference_utils,
    load_reference_vilbert,
    torch_state_dict_to_numpy,
    make_reference_config,
)
from tests.test_training_parity import (
    ReferenceAdamW,
    _import_params,
    _tiny_cfg,
    adamw_param_groups,
    _FakeLoader,
)

pytestmark = pytest.mark.slow

NUM_LABELS = 3129   # reference hardcodes the vil_prediction head width
TRAIN_ITER_GAP = 4  # reference args.train_iter_gap default
LR_REDUCE = (5, 7)  # reference lr_reduce_list (train_tasks.py:439)


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_vilbert()


@pytest.fixture(scope="module")
def ref_utils():
    return load_reference_utils()


# ---------------------------------------------------------------------------
# synthetic world with a learnable signal
# ---------------------------------------------------------------------------


def _signal_batches(cfg, seed, n_batches, B, T, R, kind, proj):
    """Batches whose target is a deterministic function of the features:
    class = argmax over 3 of (proj @ mean-region-feature). Learnable, so
    training moves the val score; discrete, so both stacks converge to the
    same per-sample decisions and the controller comparisons stay stable."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        feats = rng.randn(B, R, cfg.v_feature_size).astype(np.float32)
        cls = np.argmax(feats.mean(axis=1) @ proj, axis=1)  # [B] in {0,1,2}
        b = {
            "question": rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32),
            "features": feats,
            "spatials": rng.rand(B, R, 5).astype(np.float32),
            "segment_ids": np.zeros((B, T), np.int32),
            "input_mask": np.ones((B, T), np.int32),
            "image_mask": np.ones((B, R), np.int32),
            "co_attention_mask": np.zeros((B, R, T), np.float32),
        }
        if kind == "vqa":
            t = np.zeros((B, NUM_LABELS), np.float32)
            t[np.arange(B), cls] = 1.0
            b["target"] = t
        else:
            b["target"] = cls.astype(np.int32)
        out.append(b)
    return out


def make_world(cfg, *, B=4, T=9, R=6, n_train=(4, 6), n_val=2, seed=23):
    rng = np.random.RandomState(seed)
    proj = rng.randn(cfg.v_feature_size, 3).astype(np.float32)
    train = {
        "TASK_A": _signal_batches(cfg, seed + 1, n_train[0], B, T, R, "vqa", proj),
        "TASK_B": _signal_batches(cfg, seed + 2, n_train[1], B, T, R, "tri", proj),
    }
    val = {
        "TASK_A": _signal_batches(cfg, seed + 3, n_val, B, T, R, "vqa", proj),
        "TASK_B": _signal_batches(cfg, seed + 4, n_val, B, T, R, "tri", proj),
    }
    return train, val


# ---------------------------------------------------------------------------
# the torch mirror of the full reference loop (train_tasks.py:510-637)
# ---------------------------------------------------------------------------


def _to_t(x, long=False):
    x = np.asarray(x)
    if long:
        return torch.tensor(x.astype(np.int64))
    return torch.tensor(x)


def _ref_forward(model, b, task_id, task_tokens=False):
    kwargs = {}
    if task_tokens:
        # mirrors `int(task_id[4:])` for TASK1/TASK2 (task_utils.py:108) —
        # our TaskConfig.task_id carries the same numeral
        tid = {"TASK_A": 1, "TASK_B": 2}[task_id]
        kwargs["task_ids"] = torch.full(
            (b["question"].shape[0], 1), tid, dtype=torch.long
        )
    return model(
        _to_t(b["question"], long=True),
        _to_t(b["features"]),
        _to_t(b["spatials"]),
        _to_t(b["segment_ids"], long=True),
        _to_t(b["input_mask"], long=True),
        _to_t(b["image_mask"], long=True),
        _to_t(b["co_attention_mask"]),
        **kwargs,
    )


def _ref_loss_and_score(kind, out, b):
    """VL-classifier / VL-tri-classifier loss + summed batch score, exactly
    as ForwardModels{Train,Val} compute them (task_utils.py:121-163)."""
    bce = torch.nn.BCEWithLogitsLoss(reduction="mean")
    ce = torch.nn.CrossEntropyLoss()
    if kind == "vqa":
        logits = out[0]
        target = _to_t(b["target"])
        loss = bce(logits, target) * target.size(1)
        pred = torch.argmax(logits, dim=1)
        score = float(target.gather(1, pred.view(-1, 1)).sum())
    else:
        logits = out[4]
        target = _to_t(b["target"], long=True)
        loss = ce(logits, target)
        score = float((torch.argmax(logits, dim=1) == target).sum())
    return loss, score


def run_reference(
    ref_model, ref_utils, train_batches, val_batches, *,
    num_epochs, base_lr, head_lr, warmup_proportion, grad_accum=1,
    task_tokens=False, lr_scheduler="mannul", epoch_lr_trace=None,
):
    """Line-by-line mirror of the reference epoch loop for two tasks with
    lr_scheduler='mannul' or 'automatic'. Returns (train_losses,
    eval_records) where eval_records is
    [(iterId, task, val_score, in_stop_after_step)].

    'automatic' uses torch's REAL ReduceLROnPlateau as the oracle for the
    epoch-end LR transition. NOTE the reference's own automatic path is
    dead code: train_tasks.py:602 reads ``val_scores`` which is never
    assigned anywhere in the file (the intended producer,
    tbLogger.showLossValAll -> val_scores dict at utils.py:296-326, is
    never called from train_tasks.py), so ``--lr_scheduler automatic``
    NameErrors at the first epoch end. This mirror implements the evident
    intent: step the plateau scheduler on the sum of each task's most
    recent val score. ``epoch_lr_trace`` (a list) collects the post-epoch
    LR scale factor for comparison."""
    task_ids = list(train_batches)
    kinds = {"TASK_A": "vqa", "TASK_B": "tri"}
    # TASK_A trains at 2x base lr -> loss_scale 2 (train_tasks.py:239-251)
    loss_scale = {"TASK_A": 2.0, "TASK_B": 1.0}
    task_num_iters = {k: len(v) for k, v in train_batches.items()}
    # reference median_num_iter counts MICRO steps (task_ave_iter_list[-1]
    # with num_epoch == num_train_epochs -> len(loader), train_tasks:333-352)
    median_num_iter = max(len(v) for v in train_batches.values())
    num_opt_steps = median_num_iter * num_epochs // grad_accum
    warmup_steps = warmup_proportion * num_opt_steps

    model = ref_model
    model.train()
    optimizer = ReferenceAdamW(
        adamw_param_groups(model, base_lr, head_lr=head_lr),
        lr=base_lr, correct_bias=False, eps=1e-3,
    )
    for g in optimizer.param_groups:
        g["initial_lr"] = g["lr"]

    # --- the two chained schedulers, with construction-order semantics ---
    warm_steps_taken = 0        # WarmupConstantSchedule.last_epoch
    mannul_steps_taken = 0      # LambdaLR.last_epoch

    def warm_lambda(k):
        if k < warmup_steps:
            return float(k) / float(max(1.0, warmup_steps))
        return 1.0

    def mannul_lambda(e):
        return 0.2 ** sum(1 for r in LR_REDUCE if r <= e)

    def set_scale(lam):
        for g in optimizer.param_groups:
            g["lr"] = g["initial_lr"] * lam

    plateau = None
    if lr_scheduler == "automatic":
        plateau = torch.optim.lr_scheduler.ReduceLROnPlateau(
            optimizer, mode="max", factor=0.2, patience=1, cooldown=1,
            threshold=0.001,
        )
        # warmup constructed first -> lr = 0; ReduceLROnPlateau sets nothing
        # at construction, so the 0 SURVIVES (unlike the mannul clobber)
        set_scale(warm_lambda(0))
    else:
        set_scale(warm_lambda(0))      # warmup constructed first -> lr = 0
        set_scale(mannul_lambda(0))    # mannul constructed second -> clobber

    last_val_scores = {}
    controllers = {
        k: ref_utils.MultiTaskStopOnPlateau(
            mode="max", patience=1, continue_threshold=0.005, cooldown=1,
            threshold=0.001,
        )
        for k in task_ids
    }

    task_count = {k: 0 for k in task_ids}
    global_step = 0
    train_losses = {k: [] for k in task_ids}
    eval_records = []

    def next_train_batch(key):
        i = task_count[key] % len(train_batches[key])
        task_count[key] += 1
        return train_batches[key][i]

    def evaluate(key, iter_id):
        model.eval()
        tot_score, n = 0.0, 0
        with torch.no_grad():
            for b in val_batches[key]:
                out = _ref_forward(model, b, key, task_tokens)
                _, score = _ref_loss_and_score(kinds[key], out, b)
                tot_score += score
                n += b["features"].shape[0]
        val_score = tot_score / n
        last_val_scores[key] = val_score
        controllers[key].step(val_score)
        # record in accumulation-WINDOW units keyed by PARAM STATE: a
        # reference eval after iterId s sees params after floor((s+1)/ga)
        # optimizer steps == our params after iteration floor((s+1)/ga)-1
        eval_records.append(
            ((iter_id + 1) // grad_accum - 1, key, val_score,
             controllers[key].in_stop)
        )
        model.train()

    for epoch in range(num_epochs):
        for step in range(median_num_iter):
            iter_id = step + epoch * median_num_iter
            first_task = True
            for key in task_ids:
                is_forward = (not controllers[key].in_stop) or (
                    iter_id % TRAIN_ITER_GAP == 0
                )
                if not is_forward:
                    continue
                b = next_train_batch(key)
                out = _ref_forward(model, b, key, task_tokens)
                loss, _ = _ref_loss_and_score(kinds[key], out, b)
                train_losses[key].append(float(loss.detach()))
                loss = loss * loss_scale[key]
                if grad_accum > 1:
                    loss = loss / grad_accum
                loss.backward()
                if (step + 1) % grad_accum == 0:
                    optimizer.step()
                    model.zero_grad()
                    if first_task and global_step < warmup_steps:
                        warm_steps_taken += 1
                        set_scale(warm_lambda(warm_steps_taken))
                    if first_task:
                        global_step += 1
                        first_task = False
            for key in task_ids:
                due = (iter_id != 0 and iter_id % task_num_iters[key] == 0) or (
                    epoch == num_epochs - 1 and step == median_num_iter - 1
                )
                if due:
                    evaluate(key, iter_id)
        if plateau is not None:
            # automatic steps on summed val scores (train_tasks.py:601-602)
            plateau.step(sum(last_val_scores.values()))
        else:
            # mannul steps at epoch end (train_tasks.py:604-605)
            mannul_steps_taken += 1
            set_scale(mannul_lambda(mannul_steps_taken))
        if epoch_lr_trace is not None:
            g0 = optimizer.param_groups[0]
            epoch_lr_trace.append(g0["lr"] / g0["initial_lr"])
        if epoch in LR_REDUCE:
            for key in task_ids:
                controllers[key]._reset()
    return train_losses, eval_records


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------


def run_ours(
    cfg, params, train_batches, val_batches, *, num_epochs, base_lr, head_lr,
    warmup_proportion, grad_accum=1, B=4, schedule="mannul",
    epoch_lr_trace=None,
):
    from vilbert_tpu.core.config import OptimizerConfig, TaskConfig, TrainConfig
    from vilbert_tpu.train.multitask import MultiTaskTrainer

    tasks = {
        "TASK_A": TaskConfig(
            task_id=1, name="A", type="VL-classifier",
            loss="BCEWithLogitLoss", batch_size=B, lr=2 * base_lr,
            num_epoch=num_epochs, num_labels=NUM_LABELS,
        ),
        "TASK_B": TaskConfig(
            task_id=2, name="B", type="VL-tri-classifier",
            loss="CrossEntropyLoss", batch_size=B, lr=base_lr,
            num_epoch=num_epochs, num_labels=3,
        ),
    }
    trainer = MultiTaskTrainer(
        cfg, tasks,
        {k: _FakeLoader(v, B) for k, v in train_batches.items()},
        val_loaders={k: _FakeLoader(v, B) for k, v in val_batches.items()},
        opt_cfg=OptimizerConfig(
            learning_rate=base_lr, schedule=schedule,
            warmup_proportion=warmup_proportion, head_lr=head_lr,
            correct_bias=False, weight_decay=0.01, eps=1e-3,
        ),
        train_cfg=TrainConfig(
            train_iter_gap=TRAIN_ITER_GAP,
            gradient_accumulation_steps=grad_accum,
        ),
        num_labels=NUM_LABELS,
        init_params=params,
        num_train_epochs=num_epochs,
        dropout_prob=0.0,
    )
    train_losses = {k: [] for k in tasks}
    eval_records = []

    if epoch_lr_trace is not None:
        orig_epoch_end = trainer.schedule.on_epoch_end

        def traced_epoch_end(epoch, val_score_sum=None):
            orig_epoch_end(epoch, val_score_sum)
            epoch_lr_trace.append(trainer.schedule.decay_factor)

        trainer.schedule.on_epoch_end = traced_epoch_end

    # train() order per iteration: train_iteration -> evals -> hooks. Track
    # the current global iteration id by wrapping train_iteration so each
    # eval record carries the iteration (window) it ran after.
    cur = {"it": 0}
    orig_iter = trainer.train_iteration

    def tracked_iteration(global_iter_id):
        cur["it"] = global_iter_id
        return orig_iter(global_iter_id)

    trainer.train_iteration = tracked_iteration

    orig_eval = trainer.evaluate

    def record_eval(key, max_batches=None):
        r = orig_eval(key, max_batches)
        eval_records.append(
            (cur["it"], key, r["score"],
             trainer.controller.controllers[key].in_stop)
        )
        return r

    trainer.evaluate = record_eval

    def hook(epoch, it, state, metrics):
        for k, m in metrics.items():
            train_losses[k].append(float(m["loss"]))

    trainer.train(num_epochs, eval_cadence="reference", log_every=0,
                  lr_drop_epochs=LR_REDUCE, hooks=[hook])
    return train_losses, eval_records


# ---------------------------------------------------------------------------
# the comparisons
# ---------------------------------------------------------------------------


def _compare(ref, ours, n_val_samples, label=""):
    ref_losses, ref_evals = ref
    our_losses, our_evals = ours
    # 1) same number of forwards per task (stop-gating agreed end to end)
    for k in ref_losses:
        assert len(ref_losses[k]) == len(our_losses[k]), (
            label, k, len(ref_losses[k]), len(our_losses[k]))
    # 2) train losses track (chaos-aware tolerance; see
    #    test_training_parity.py for the calibration of these bounds)
    for k in ref_losses:
        np.testing.assert_allclose(
            our_losses[k][:5], ref_losses[k][:5], rtol=2e-2, err_msg=(label, k)
        )
        np.testing.assert_allclose(
            our_losses[k], ref_losses[k], rtol=0.25, atol=0.05,
            err_msg=(label, k),
        )
    # 3) eval schedule is identical: same (iterId, task) sequence
    assert [(i, k) for i, k, *_ in ref_evals] == \
        [(i, k) for i, k, *_ in our_evals], label
    # 4) val scores match within one sample flip per eval
    tol = 1.0 / n_val_samples + 1e-9
    for (ri, rk, rs, _), (oi, ok, os_, _) in zip(ref_evals, our_evals):
        assert abs(rs - os_) <= tol + 1e-9, (label, ri, rk, rs, os_)
    # 5) controller in_stop transitions occur at the same evals
    ref_stops = [(i, k, st) for i, k, _, st in ref_evals]
    our_stops = [(i, k, st) for i, k, _, st in our_evals]
    assert ref_stops == our_stops, (label, ref_stops, our_stops)
    # 6) final val scores match
    assert abs(ref_evals[-1][2] - our_evals[-1][2]) <= tol, label
    # the run must be NON-TRIVIAL: scores moved and stops actually happened
    scores = [s for _, _, s, _ in ref_evals]
    assert max(scores) > min(scores) + 1e-6, (label, "flat val scores")
    assert any(st for *_, st in ref_evals), (label, "no in_stop transition")


class TestFullRunEquivalence:
    NUM_EPOCHS = 9          # crosses both LR-drop epochs {5, 7}
    BASE_LR = 5e-4
    HEAD_LR = 1e-3
    WARMUP = 0.1
    B = 4

    def _setup(self, ref_mod, cfg, task_tokens=False):
        torch.manual_seed(0)
        ref_cfg = make_reference_config(ref_mod, cfg)
        ref_model = ref_mod.VILBertForVLTasks(
            ref_cfg, num_labels=NUM_LABELS, dropout_prob=0.0
        )
        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

        flax_model = ViLBERTForVLTasks(cfg, num_labels=NUM_LABELS)
        train, val = make_world(cfg, B=self.B)
        b0 = train["TASK_A"][0]
        kwargs = {}
        if task_tokens:
            kwargs = {"task_ids": np.ones((self.B, 1), np.int32)}
        params = _import_params(
            ref_model, flax_model,
            (b0["question"], b0["features"], b0["spatials"]),
            init_kwargs=kwargs,
        )
        return ref_model, params, train, val

    def test_full_run_matches(self, ref_mod, ref_utils):
        cfg = _tiny_cfg()
        ref_model, params, train, val = self._setup(ref_mod, cfg)
        ref = run_reference(
            ref_model, ref_utils, train, val,
            num_epochs=self.NUM_EPOCHS, base_lr=self.BASE_LR,
            head_lr=self.HEAD_LR, warmup_proportion=self.WARMUP,
        )
        ours = run_ours(
            cfg, params, train, val,
            num_epochs=self.NUM_EPOCHS, base_lr=self.BASE_LR,
            head_lr=self.HEAD_LR, warmup_proportion=self.WARMUP, B=self.B,
        )
        n_val = sum(b["features"].shape[0] for b in val["TASK_A"])
        _compare(ref, ours, n_val, label="full-run")

    def test_full_run_matches_automatic_lr(self, ref_mod, ref_utils):
        """`--lr_scheduler automatic` variant (VERDICT r4 item 9): the full
        run with ReduceLROnPlateau(mode=max, factor=0.2, patience=1,
        cooldown=1, threshold=0.001) stepped on summed val scores at epoch
        end, with torch's REAL ReduceLROnPlateau as the LR oracle — the val
        scores rise then plateau, so a genuine plateau-triggered LR drop
        must happen at the same epoch with the same factor on both stacks.

        (The reference's own automatic branch is unrunnable dead code —
        train_tasks.py:602 NameErrors on the never-assigned ``val_scores``;
        see run_reference's docstring. The mirror implements the evident
        intent.)"""
        cfg = _tiny_cfg()
        ref_model, params, train, val = self._setup(ref_mod, cfg)
        ref_lr, our_lr = [], []
        ref = run_reference(
            ref_model, ref_utils, train, val,
            num_epochs=7, base_lr=self.BASE_LR,
            head_lr=self.HEAD_LR, warmup_proportion=self.WARMUP,
            lr_scheduler="automatic", epoch_lr_trace=ref_lr,
        )
        ours = run_ours(
            cfg, params, train, val,
            num_epochs=7, base_lr=self.BASE_LR,
            head_lr=self.HEAD_LR, warmup_proportion=self.WARMUP, B=self.B,
            schedule="automatic", epoch_lr_trace=our_lr,
        )
        n_val = sum(b["features"].shape[0] for b in val["TASK_A"])
        _compare(ref, ours, n_val, label="automatic-lr")
        # the LR transition trace matches torch's ReduceLROnPlateau exactly
        assert len(ref_lr) == len(our_lr) == 7, (ref_lr, our_lr)
        np.testing.assert_allclose(our_lr, ref_lr, rtol=1e-9,
                                   err_msg="plateau LR traces diverge")
        # and a REAL plateau-triggered drop happened mid-run
        assert ref_lr[-1] < 1.0 - 1e-9, (
            "no plateau LR drop occurred — the variant proves nothing",
            ref_lr,
        )

    def test_full_run_matches_grad_accum(self, ref_mod, ref_utils):
        """Same world with gradient_accumulation_steps=2 — shorter run (the
        accumulation semantics are the target; LR drops are covered above).
        Loader lengths are multiples of ga so reference evals land on
        accumulation-window boundaries."""
        cfg = _tiny_cfg()
        torch.manual_seed(0)
        ref_cfg = make_reference_config(ref_mod, cfg)
        ref_model = ref_mod.VILBertForVLTasks(
            ref_cfg, num_labels=NUM_LABELS, dropout_prob=0.0
        )
        from vilbert_tpu.models.vilbert import ViLBERTForVLTasks

        flax_model = ViLBERTForVLTasks(cfg, num_labels=NUM_LABELS)
        train, val = make_world(cfg, B=self.B, n_train=(8, 8), seed=31)
        b0 = train["TASK_A"][0]
        params = _import_params(
            ref_model, flax_model,
            (b0["question"], b0["features"], b0["spatials"]),
        )
        # 3 epochs: with patience=1 the earliest possible in_stop is the
        # 3rd eval == the FINAL eval, so the one structural delta under
        # grad accum (the reference can flip in_stop mid-accumulation-window
        # and gate the window's remaining micro-steps; we gate whole
        # windows) cannot influence training inside this run
        ref = run_reference(
            ref_model, load_reference_utils(), train, val,
            num_epochs=3, base_lr=self.BASE_LR, head_lr=self.HEAD_LR,
            warmup_proportion=self.WARMUP, grad_accum=2,
        )
        ours = run_ours(
            cfg, params, train, val,
            num_epochs=3, base_lr=self.BASE_LR, head_lr=self.HEAD_LR,
            warmup_proportion=self.WARMUP, grad_accum=2, B=self.B,
        )
        n_val = sum(b["features"].shape[0] for b in val["TASK_A"])
        # under grad accum the stop-gating can only diverge if a task enters
        # in_stop (reference trains 1 micro-step of a window, we train the
        # window); compare through the eval/score record
        ref_losses, ref_evals = ref
        our_losses, our_evals = ours
        assert [(i, k) for i, k, *_ in ref_evals] == \
            [(i, k) for i, k, *_ in our_evals]
        tol = 1.0 / n_val + 1e-9
        for (ri, rk, rs, rst), (oi, ok, os_, ost) in zip(ref_evals, our_evals):
            assert abs(rs - os_) <= tol, (ri, rk, rs, os_)
            assert rst == ost, (ri, rk, rst, ost)
        for k in ref_losses:
            # reference logs one loss per MICRO step; ours reports the
            # window mean — compare window means
            rl = ref_losses[k]
            ref_win = [(a + b) / 2 for a, b in zip(rl[::2], rl[1::2])]
            np.testing.assert_allclose(
                our_losses[k][:5], ref_win[:5], rtol=2e-2, err_msg=k
            )
            np.testing.assert_allclose(
                our_losses[k], ref_win, rtol=0.25, atol=0.05, err_msg=k
            )

    def test_full_run_matches_task_tokens(self, ref_mod, ref_utils):
        """task_specific_tokens=True variant — the task-token splice goes
        through the full loop (shorter run: 4 epochs, no LR drop)."""
        cfg = _tiny_cfg(task_specific_tokens=True)
        ref_model, params, train, val = self._setup(
            ref_mod, cfg, task_tokens=True
        )
        ref = run_reference(
            ref_model, ref_utils, train, val,
            num_epochs=4, base_lr=self.BASE_LR, head_lr=self.HEAD_LR,
            warmup_proportion=self.WARMUP, task_tokens=True,
        )
        ours = run_ours(
            cfg, params, train, val,
            num_epochs=4, base_lr=self.BASE_LR, head_lr=self.HEAD_LR,
            warmup_proportion=self.WARMUP, B=self.B,
        )
        ref_losses, ref_evals = ref
        our_losses, our_evals = ours
        for k in ref_losses:
            assert len(ref_losses[k]) == len(our_losses[k])
            np.testing.assert_allclose(
                our_losses[k][:5], ref_losses[k][:5], rtol=2e-2, err_msg=k
            )
        n_val = sum(b["features"].shape[0] for b in val["TASK_A"])
        tol = 1.0 / n_val + 1e-9
        assert [(i, k) for i, k, *_ in ref_evals] == \
            [(i, k) for i, k, *_ in our_evals]
        for (ri, rk, rs, _), (_, _, os_, _) in zip(ref_evals, our_evals):
            assert abs(rs - os_) <= tol, (ri, rk, rs, os_)


# ---------------------------------------------------------------------------
# CC pretraining: full tiny train_concap run vs torch (VERDICT r4 item 5)
# ---------------------------------------------------------------------------


class TestConcapFullRunEquivalence:
    """Full tiny Conceptual-Captions pretraining runs on both stacks —
    multiple epochs with the reference's per-epoch 3-loss validation pass
    (train_concap.py:608-654) — must produce matching per-step train-loss
    and per-epoch val-loss trajectories, for objectives 0, 1 and 2.

    The torch side mirrors train_concap.py's epoch loop line by line:
    objective-1 label clearing (:535-540), objective-2 nsp zeroing (:555-556),
    img_weight scaling (:557-558), scheduler.step() BEFORE optimizer.step()
    (:583-586), and a val pass computing the three RAW losses (no objective
    transforms, :608-654). Ours is ``run_pretraining`` with
    ``val_every=steps_per_epoch``.
    """

    NUM_EPOCHS = 3
    N_TRAIN = 5
    N_VAL = 3
    LR = 1e-3
    WARMUP = 0.1
    EPS = 1e-3          # see TestConcapTrajectory.EPS for the rationale
    B, T, R = 8, 9, 6

    def _batches(self, cfg, n, seed):
        rng = np.random.RandomState(seed)
        out = []
        for _ in range(n):
            b = {
                "input_ids": rng.randint(
                    1, cfg.vocab_size, (self.B, self.T)).astype(np.int32),
                "segment_ids": np.zeros((self.B, self.T), np.int32),
                "input_mask": np.ones((self.B, self.T), np.int32),
                "image_feat": rng.randn(
                    self.B, self.R, cfg.v_feature_size).astype(np.float32),
                "image_loc": rng.rand(self.B, self.R, 5).astype(np.float32),
                "image_mask": np.ones((self.B, self.R), np.int32),
                "lm_label_ids": np.full((self.B, self.T), -1, np.int64),
                "image_label": np.full((self.B, self.R - 1), -1, np.int64),
                "image_target": rng.rand(
                    self.B, self.R - 1, cfg.v_target_size).astype(np.float32),
                # ensure >=2 aligned pairs so objective-1 clearing never
                # empties the LM loss (all-(-1) labels nan torch's CE)
                "is_next": np.concatenate(
                    [np.zeros(2, np.int64),
                     rng.randint(0, 2, (self.B - 2,)).astype(np.int64)]),
            }
            b["input_mask"][:, -2:] = 0
            # token id 0 is [PAD]/never a masked target (labels >=1), so the
            # reference's obj-1 `label[label == 0] = -1` quirk is equivalent
            # to clearing misaligned rows
            b["lm_label_ids"][:, 2] = rng.randint(1, cfg.vocab_size, self.B)
            b["lm_label_ids"][:, 4] = rng.randint(1, cfg.vocab_size, self.B)
            b["image_label"][:, 1] = 1
            b["image_target"] /= b["image_target"].sum(-1, keepdims=True)
            out.append(b)
        return out

    def _run_reference(self, model, train, val, objective):
        from tests.test_training_parity import warmup_linear_lambda

        model.train()
        optimizer = ReferenceAdamW(
            adamw_param_groups(model, self.LR), lr=self.LR,
            betas=(0.9, 0.98), eps=self.EPS,
        )
        num_opt_steps = self.NUM_EPOCHS * len(train)
        warmup = self.WARMUP * num_opt_steps
        train_losses, val_records = [], []
        global_step = 0
        for epoch in range(self.NUM_EPOCHS):
            model.train()
            for b in train:
                lm_label_ids = torch.tensor(b["lm_label_ids"])
                image_label = torch.tensor(b["image_label"])
                is_next = torch.tensor(b["is_next"])
                if objective == 1:
                    # train_concap.py:535-540 verbatim
                    image_label = image_label * (is_next == 0).long().unsqueeze(1)
                    image_label[image_label == 0] = -1
                    lm_label_ids = lm_label_ids * (is_next == 0).long().unsqueeze(1)
                    lm_label_ids[lm_label_ids == 0] = -1
                optimizer.zero_grad()
                lm, img, nsp = model(
                    torch.tensor(b["input_ids"].astype(np.int64)),
                    torch.tensor(b["image_feat"]),
                    torch.tensor(b["image_loc"]),
                    torch.tensor(b["segment_ids"].astype(np.int64)),
                    torch.tensor(b["input_mask"].astype(np.int64)),
                    torch.tensor(b["image_mask"].astype(np.int64)),
                    masked_lm_labels=lm_label_ids,
                    image_label=image_label,
                    image_target=torch.tensor(b["image_target"]),
                    next_sentence_label=is_next,
                )
                if objective == 2:
                    nsp = nsp * 0
                loss = lm + img + nsp
                loss.backward()
                # scheduler.step() BEFORE optimizer.step() (:583-586)
                global_step += 1
                lam = warmup_linear_lambda(global_step, warmup, num_opt_steps)
                for g in optimizer.param_groups:
                    g["lr"] = self.LR * lam
                optimizer.step()
                train_losses.append(float(loss.detach()))
            # per-epoch validation: three RAW losses, no objective transforms
            # (train_concap.py:608-654); equal batch sizes -> plain mean
            model.eval()
            tot = np.zeros(4)
            with torch.no_grad():
                for b in val:
                    lm, img, nsp = model(
                        torch.tensor(b["input_ids"].astype(np.int64)),
                        torch.tensor(b["image_feat"]),
                        torch.tensor(b["image_loc"]),
                        torch.tensor(b["segment_ids"].astype(np.int64)),
                        torch.tensor(b["input_mask"].astype(np.int64)),
                        torch.tensor(b["image_mask"].astype(np.int64)),
                        masked_lm_labels=torch.tensor(b["lm_label_ids"]),
                        image_label=torch.tensor(b["image_label"]),
                        image_target=torch.tensor(b["image_target"]),
                        next_sentence_label=torch.tensor(b["is_next"]),
                    )
                    tot += [float(lm), float(img), float(nsp),
                            float(lm + img + nsp)]
            tot /= len(val)
            val_records.append({
                "masked_loss_t": tot[0], "masked_loss_v": tot[1],
                "next_sentence_loss": tot[2], "loss": tot[3],
            })
        return train_losses, val_records

    @pytest.mark.parametrize("objective", [0, 1, 2])
    def test_full_concap_run_matches(self, ref_mod, objective):
        from vilbert_tpu.core.config import OptimizerConfig
        from vilbert_tpu.models.vilbert import ViLBERTForPretraining
        from vilbert_tpu.train.pretrain import run_pretraining

        cfg = _tiny_cfg(objective=objective)
        train = self._batches(cfg, self.N_TRAIN, seed=7 + objective)
        val = self._batches(cfg, self.N_VAL, seed=97 + objective)

        torch.manual_seed(0)
        ref_cfg = make_reference_config(ref_mod, cfg)
        ref_model = ref_mod.BertForMultiModalPreTraining(ref_cfg)
        flax_model = ViLBERTForPretraining(cfg)
        b0 = train[0]
        params = _import_params(
            ref_model, flax_model,
            (b0["input_ids"], b0["image_feat"], b0["image_loc"]),
        )
        ref_losses, ref_vals = self._run_reference(
            ref_model, train, val, objective
        )

        opt_cfg = OptimizerConfig(
            learning_rate=self.LR, beta2=0.98, eps=self.EPS,
            weight_decay=0.01, warmup_proportion=self.WARMUP,
            schedule="warmup_linear",
        )
        our_losses, val_history = [], []
        run_pretraining(
            cfg, opt_cfg, train,
            num_steps=self.NUM_EPOCHS * len(train), init_params=params,
            log_every=0, val_loader=val, val_every=len(train),
            val_history=val_history,
            hooks=[lambda step, st, m: our_losses.append(float(m["loss"]))],
        )

        # one val pass per epoch, at the same steps
        assert [s for s, _ in val_history] == [
            (e + 1) * len(train) for e in range(self.NUM_EPOCHS)
        ]
        # train-loss trajectory: tight early, chaos-aware overall (same
        # calibration as TestConcapTrajectory)
        np.testing.assert_allclose(
            our_losses[:5], ref_losses[:5], rtol=1e-2, err_msg=objective
        )
        np.testing.assert_allclose(
            our_losses, ref_losses, rtol=5e-2, err_msg=objective
        )
        # per-epoch val: all three losses + total match epoch by epoch
        for e, (ref_v, (_, our_v)) in enumerate(zip(ref_vals, val_history)):
            for key in ("masked_loss_t", "masked_loss_v",
                        "next_sentence_loss", "loss"):
                np.testing.assert_allclose(
                    our_v[key], ref_v[key], rtol=5e-2, atol=5e-3,
                    err_msg=(objective, e, key),
                )
        # non-trivial: training genuinely moved the model — the train loss
        # dropped and the val total shifted. (Not "val LM loss decreased":
        # under objective 2 the nsp signal is zeroed and at this step count
        # the val LM component can drift up a hair while the image loss
        # carries the learning; the parity assertions above are the test.)
        assert ref_losses[-1] < ref_losses[0], (
            "flat train trajectory — the run proves nothing"
        )
        assert abs(ref_vals[-1]["loss"] - ref_vals[0]["loss"]) > 1e-3, (
            "flat val trajectory — the run proves nothing"
        )
