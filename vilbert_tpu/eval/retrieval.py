"""Image↔text retrieval ranking evaluation.

Rebuilds eval_retrieval.py (reference call stack SURVEY.md §3.4): each
caption is scored against a pool of images (reference: 1000 val images in two
halves of 500, RetreivalDatasetVal retreival_dataset.py:325-471), the true
image's rank yields R@1/5/10 and median/mean rank (eval_retrieval.py:315-351).

TPU design: the caption is broadcast over the image pool with the model's
``fast_mode`` (text stream runs once at batch 1 until the first co-attention,
reference vilbert.py:1042-1053) and scoring runs in fixed-size image chunks
under one jitted function.

Zero-shot mode scores with softmax(alignment logit)[:, 0] from the
pretraining heads (eval_retrieval.py:281-296); fine-tuned mode uses
``vil_logit`` (:299-313).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ranking_metrics(
    score_matrix: np.ndarray, target_indices: np.ndarray
) -> Dict[str, float]:
    """R@1/5/10 + median/mean rank from a [num_captions, pool] score matrix
    (reference eval_retrieval.py:315-351; rank is the position of the true
    image when scores are sorted descending)."""
    order = np.argsort(-score_matrix, axis=1)
    ranks = np.empty(score_matrix.shape[0], np.int64)
    for i in range(score_matrix.shape[0]):
        ranks[i] = int(np.where(order[i] == target_indices[i])[0][0])
    return {
        "r1": float(np.mean(ranks < 1)),
        "r5": float(np.mean(ranks < 5)),
        "r10": float(np.mean(ranks < 10)),
        "medr": float(np.median(ranks) + 1),
        "meanr": float(np.mean(ranks) + 1),
    }


def make_vil_logit_scorer(model, params) -> Callable:
    """score(caption, image chunk) via the vil_logit head (fine-tuned).

    Build the model with ``fast_mode=True`` and pass the caption tensors at
    batch 1: the text stream then runs ONCE per caption and is broadcast over
    the image chunk inside the encoder at the first co-attention layer
    (reference eval_retrieval.py:220 + vilbert.py:1042-1053).

    ``params`` is a jit ARGUMENT, not a closure: closed-over host params get
    inlined as HLO constants (~1 GB of literals for bert_base), which blows up
    the compile request on remote-compile backends. Passing them as a
    device-resident argument keeps the HLO small and transfers weights once.
    """

    @jax.jit
    def score(params, question, features, spatials, input_mask, segment_ids,
              image_mask):
        out = model.apply(
            {"params": params}, question, features, spatials, segment_ids,
            input_mask, image_mask, heads=("vil_logit",),
        )
        return out.vil_logit[:, 0]

    return functools.partial(score, jax.device_put(params))


def make_alignment_scorer(model, params) -> Callable:
    """score via softmax(seq_relationship)[:, 0] (zero-shot,
    eval_retrieval.py:281-296). Params are a jit argument — see
    make_vil_logit_scorer."""

    @jax.jit
    def score(params, question, features, spatials, input_mask, segment_ids,
              image_mask):
        out = model.apply(
            {"params": params}, question, features, spatials, segment_ids,
            input_mask, image_mask,
        )
        return jax.nn.softmax(out.seq_relationship_score, axis=1)[:, 0]

    return functools.partial(score, jax.device_put(params))


def evaluate_retrieval(
    scorer: Callable,
    caption_iter: Iterable[Dict[str, np.ndarray]],
    pool: Dict[str, np.ndarray],
    *,
    chunk: int = 500,
    fast_mode: bool = False,
) -> Dict[str, float]:
    """Score every caption against the full image pool.

    Args:
      scorer: jitted (question, features, spatials, input_mask, segment_ids,
        image_mask) -> [chunk] scores; the caption tensors are broadcast
        host-side to the chunk size (fast_mode models broadcast on device).
      caption_iter: dicts with "question"/"input_mask"/"segment_ids" [T] and
        "target_index" (position of the true image in the pool).
      pool: stacked image tensors {"features" [P,R,D], "spatials" [P,R,5],
        "image_mask" [P,R]}.
    """
    P = pool["features"].shape[0]
    assert P % chunk == 0, f"pool {P} must be a multiple of chunk {chunk}"
    # transfer each pool chunk to the device ONCE up front (a 1000-image fp32
    # pool is ~830 MB; re-sending a chunk per caption would dominate wall time
    # on a remote-transfer backend)
    chunks = [
        {k: jnp.asarray(v[c0 : c0 + chunk]) for k, v in pool.items()}
        for c0 in range(0, P, chunk)
    ]
    rows, targets = [], []
    text_batch = 1 if fast_mode else chunk
    for cap in caption_iter:
        scores = []
        for ch in chunks:
            q = np.broadcast_to(cap["question"], (text_batch,) + cap["question"].shape)
            im = np.broadcast_to(cap["input_mask"], (text_batch,) + cap["input_mask"].shape)
            sg = np.broadcast_to(cap["segment_ids"], (text_batch,) + cap["segment_ids"].shape)
            s = scorer(
                q,
                ch["features"],
                ch["spatials"],
                im,
                sg,
                ch["image_mask"],
            )
            scores.append(np.asarray(s))
        rows.append(np.concatenate(scores))
        targets.append(int(cap["target_index"]))
    return ranking_metrics(np.stack(rows), np.asarray(targets))
