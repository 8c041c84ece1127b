"""Driver entrypoint robustness.

The round-1 driver failure (MULTICHIP_r01.json ok=false) was
``dryrun_multichip(8)`` asserting on device count when invoked in a process
whose (1-chip) backend was already initialized. The fix re-execs the dryrun
in a subprocess forced to an n-device virtual CPU platform; these tests
exercise both paths.
"""

import pytest
import sys

pytestmark = pytest.mark.slow


def _load_entry():
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(root, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__graft_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_in_process_with_enough_devices(capsys):
    # the test session runs on an 8-device virtual CPU mesh (conftest)
    entry = _load_entry()
    entry.dryrun_multichip(8)
    assert "ok" in capsys.readouterr().out


def test_dryrun_reexecs_when_devices_insufficient(capsys):
    # 16 > the session's 8 devices AND the backend here is already
    # initialized — exactly the recorded driver failure mode. Must fall back
    # to a fresh subprocess with a 16-device CPU platform.
    import jax

    assert len(jax.devices()) < 16
    entry = _load_entry()
    entry.dryrun_multichip(16)
    out = capsys.readouterr().out
    assert "dryrun_multichip(16): ok" in out
    assert "'data': 8, 'model': 2" in out
