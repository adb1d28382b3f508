from . import activations, init, mlp, norm, posenc  # noqa: F401
