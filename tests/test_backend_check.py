def test_backend():
    import jax
    print("backend:", jax.default_backend(), jax.devices())
    import os
    print("JAX_PLATFORMS=", os.environ.get("JAX_PLATFORMS"), "XLA_FLAGS=", os.environ.get("XLA_FLAGS"))
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
