"""Device prefetch iterator: ordering, transform, error propagation."""

import numpy as np
import pytest


def test_prefetch_preserves_order_and_places_on_device():
    import jax

    from vilbert_tpu.data.prefetch import device_prefetch

    batches = [{"x": np.full((4,), i, np.float32)} for i in range(6)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 6
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((4,), i))


def test_prefetch_transform_applied():
    from vilbert_tpu.data.prefetch import device_prefetch

    batches = [{"x": np.ones((2,)), "drop_me": np.zeros((1,))} for _ in range(3)]
    out = list(device_prefetch(
        iter(batches), size=1,
        transform=lambda b: {k: v for k, v in b.items() if k != "drop_me"},
    ))
    assert all(set(b) == {"x"} for b in out)


def test_prefetch_propagates_producer_errors():
    from vilbert_tpu.data.prefetch import device_prefetch

    def bad_iter():
        yield {"x": np.ones((2,))}
        raise RuntimeError("boom")

    it = device_prefetch(bad_iter(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_repeat_iterator_restarts_epochs():
    from vilbert_tpu.data.prefetch import repeat_iterator

    calls = []

    def make():
        calls.append(1)
        return iter([1, 2])

    it = repeat_iterator(make)
    got = [next(it) for _ in range(5)]
    assert got == [1, 2, 1, 2, 1]
    assert len(calls) == 3


class TestCompressForTransfer:
    def test_noop_for_fp32_compute(self):
        import numpy as np

        from vilbert_tpu.data.prefetch import compress_for_transfer

        b = {"image_feat": np.ones((2, 3, 4), np.float32),
             "image_target": np.ones((2, 2, 5), np.float32)}
        out = compress_for_transfer(b, "float32")
        assert out["image_feat"].dtype == np.float32
        assert out["image_target"].dtype == np.float32

    def test_bf16_feat_matches_device_cast(self):
        """Host-side bf16 cast of image_feat == what the device-side compute
        cast produces anyway (Dense casts inputs to the compute dtype), so
        the compressed transfer is bit-identical for bf16 compute."""
        import jax.numpy as jnp
        import numpy as np

        from vilbert_tpu.data.prefetch import compress_for_transfer

        rng = np.random.RandomState(0)
        b = {"image_feat": rng.randn(4, 5, 8).astype(np.float32),
             "image_target": rng.rand(4, 4, 6).astype(np.float32),
             "input_ids": np.ones((4, 7), np.int32)}
        out = compress_for_transfer(b, "bfloat16")
        assert out["image_feat"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(out["image_feat"], dtype=np.float32),
            np.asarray(jnp.asarray(b["image_feat"]).astype(jnp.bfloat16),
                       dtype=np.float32),
        )
        assert out["image_target"].dtype == np.float16
        assert out["input_ids"].dtype == np.int32
        # fp16 keeps soft-label distributions to ~1e-3 relative
        np.testing.assert_allclose(
            out["image_target"].astype(np.float32), b["image_target"],
            rtol=1e-3, atol=1e-6,
        )

    def test_raw_feature_targets_use_bf16_not_fp16(self):
        """visual_target=1 (MSE) and =2 (NCE) targets are raw detector
        features — fp16 would overflow past 65504; bf16 keeps the fp32
        range."""
        import jax.numpy as jnp
        import numpy as np

        from vilbert_tpu.data.prefetch import compress_for_transfer

        b = {"image_target": np.array([[1e5, 2.0]], np.float32)}
        out = compress_for_transfer(b, "bfloat16", raw_feature_targets=True)
        assert out["image_target"].dtype == jnp.bfloat16
        assert np.isfinite(
            np.asarray(out["image_target"], np.float32)
        ).all()
