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
