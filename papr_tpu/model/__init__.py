from .papr import create_model, forward, evaluate  # noqa: F401
