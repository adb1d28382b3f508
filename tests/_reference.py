"""Helper to import the upstream reference implementation as a test oracle.

The reference at /root/reference is used read-only, executed on CPU torch to
produce golden outputs. Its unused heavy deps (lpips pkg, torchvision) are
stubbed out — we never instantiate the LPIPS modules here.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def import_reference_models():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    # Stub dependencies that the reference imports at module scope but that
    # this environment lacks (and the oracle never calls).
    if "lpips" not in sys.modules:
        sys.modules["lpips"] = types.ModuleType("lpips")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    import models as ref_models  # noqa: F401  (the reference package)
    # The reference passes `verbose=` to torch LR schedulers, removed in
    # newer torch. The oracle never steps schedulers, so neutralize them.
    ref_models.model.create_learning_rate_fn = lambda *a, **k: None
    return ref_models
