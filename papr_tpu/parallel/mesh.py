"""Device mesh + sharding plan.

The reference is single-GPU (SURVEY.md §2.9); scaling here is TPU-native:

  * mesh axes ``('data', 'rays')`` — batch images over ``data``, the patch's
    ray rows over ``rays`` (the analogue of the reference's spatial tile loop,
    train.py:59-67, turned into SPMD);
  * parameters are replicated, gradients are summed by XLA collectives over
    ICI (inserted automatically from the sharding constraints);
  * the attention stage runs ray-sharded; the UNet needs the whole patch, so
    XLA either gathers features or exchanges conv halos — both ride ICI,
    mirroring the reference's tile-then-full-UNet dataflow.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class ShardingPlan:
    mesh: Mesh
    rays: NamedSharding        # (B, H, W, C) batch+row sharded
    batch_only: NamedSharding  # (B, ...) batch sharded
    replicated: NamedSharding


def make_mesh(data: int = 1, rays: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * rays
    if n > len(devices):
        raise ValueError(
            f"tpu.mesh=(data={data}, rays={rays}) needs {n} devices but only "
            f"{len(devices)} are visible ({devices[0].platform}); reduce the "
            f"mesh or run with XLA_FLAGS=--xla_force_host_platform_device_count")
    import numpy as np
    arr = np.asarray(devices[:n]).reshape(data, rays)
    return Mesh(arr, ("data", "rays"))


def make_plan(mesh: Mesh) -> ShardingPlan:
    return ShardingPlan(
        mesh=mesh,
        rays=NamedSharding(mesh, P("data", "rays")),
        batch_only=NamedSharding(mesh, P("data")),
        replicated=NamedSharding(mesh, P()),
    )


def mesh_from_config(cfg, devices=None) -> Mesh:
    return make_mesh(int(cfg.get_path("tpu.mesh.data", 1)),
                     int(cfg.get_path("tpu.mesh.rays", 1)), devices)
