from . import checkpoint, losses, optim, points_host, schedules, step  # noqa: F401
