from . import geometry, topk  # noqa: F401
