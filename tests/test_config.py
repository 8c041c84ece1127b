"""Config / placement validation errors surface early and readably."""

import numpy as np
import pytest


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
