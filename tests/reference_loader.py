"""Import the reference torch implementation for golden parity tests.

The reference (read-only at /root/reference) depends on boto3/requests/
tensorboardX/torch._six which are absent or gone from modern torch; this
module stubs them before import. Used ONLY by tests to produce golden values
— no reference code is shipped in the package.
"""

import math
import sys
import types

_REFERENCE_PATH = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _stub_if_missing(name: str, **attrs) -> types.ModuleType:
    """Stub ONLY when the real module is absent — replacing an installed
    package (e.g. requests) with a bare ModuleType breaks every later
    `from pkg.sub import x` in the process (huggingface_hub does exactly
    that), which poisoned unrelated tests in full-suite runs."""
    import importlib

    try:
        return importlib.import_module(name)
    except ImportError:
        return _stub(name, **attrs)


def load_reference_vilbert():
    """Returns the reference `vilbert.vilbert` torch module."""
    _stub_if_missing("boto3", client=lambda *a, **k: None,
                     resource=lambda *a, **k: None)
    try:
        import botocore.exceptions  # noqa: F401
    except ImportError:
        botocore = _stub("botocore")
        exceptions = _stub("botocore.exceptions", ClientError=Exception)
        botocore.exceptions = exceptions
    _stub_if_missing("requests", get=None, head=None)

    class _FakeTqdm:
        def __init__(self, *a, **k):
            pass

        def update(self, *a):
            pass

        def close(self):
            pass

    _stub_if_missing("tqdm", tqdm=_FakeTqdm)

    class _FakeSummaryWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

    _stub_if_missing("tensorboardX", SummaryWriter=_FakeSummaryWriter)
    _stub_if_missing("torch._six", inf=math.inf)

    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    import importlib

    mod = importlib.import_module("vilbert.vilbert")
    # basebert.py imports BertConfig from pytorch_transformers (absent);
    # the reference's own BertConfig is a superset — stub it through.
    pt = _stub("pytorch_transformers")
    mb = _stub("pytorch_transformers.modeling_bert", BertConfig=mod.BertConfig)
    pt.modeling_bert = mb
    return mod


def load_reference_utils():
    """Returns the reference `vilbert.utils` torch module (stop controllers,
    tbLogger) for oracle use in convergence tests. Reuses the same stubs as
    load_reference_vilbert (boto3/requests/tensorboardX/torch._six)."""
    load_reference_vilbert()  # installs stubs + sys.path
    import importlib

    return importlib.import_module("vilbert.utils")


def torch_state_dict_to_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def make_reference_config(ref_mod, model_config):
    """Build a reference BertConfig mirroring one of our ModelConfig."""
    d = model_config.to_dict()
    cfg = ref_mod.BertConfig.from_dict(d)
    return cfg
