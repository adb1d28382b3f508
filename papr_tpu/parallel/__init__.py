from .mesh import ShardingPlan, make_mesh, make_plan  # noqa: F401
