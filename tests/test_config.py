"""Config / placement validation errors surface early and readably."""

import numpy as np
import pytest


def test_visual_target_forces_feature_space_targets():
    """visual_target 1/2 predict in feature space: v_target_size must track
    v_feature_size (reference train_concap.py:355-360 hardcodes 2048)."""
    from vilbert_tpu.core.config import ModelConfig

    assert ModelConfig(visual_target=0).v_target_size == 1601
    for vt in (1, 2):
        cfg = ModelConfig(visual_target=vt)
        assert cfg.v_target_size == cfg.v_feature_size == 2048
    cfg = ModelConfig(visual_target=2, v_feature_size=64, v_target_size=11)
    assert cfg.v_target_size == 64


def test_softmax_dtype_typo_rejected_at_construction():
    from vilbert_tpu.core.config import ModelConfig

    with pytest.raises(AssertionError, match="softmax_dtype"):
        ModelConfig(softmax_dtype="fp32")
    # the valid spellings construct fine
    for ok in ("auto", "float32", "bfloat16"):
        ModelConfig(softmax_dtype=ok)


def test_make_global_batch_names_underranked_leaf():
    """batch_axis=1 placement over a leaf with <2 axes must raise a
    ValueError naming the leaf, not an IndexError deep in tree_map."""
    import jax
    from jax.sharding import Mesh

    from vilbert_tpu.parallel.distributed import make_global_batch

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    batch = {"ok": np.zeros((2, 4, 3)), "scalarish": np.zeros((5,))}
    with pytest.raises(ValueError, match="scalarish"):
        make_global_batch(batch, mesh, batch_axis=1)
