"""Camera/ray geometry.

Ray generation matches the reference pixel-center convention
(reference: dataset/utils.py:81-96): image-plane coordinates in units of
1/focal, y pointing up, camera looking down -z, directions rotated to world
by c2w and normalized. ``get_rays`` is host-side numpy (it feeds the data
pipeline); the point-ray math used inside the model lives in jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------- host (numpy) --

def get_rays_np(H: int, W: int, focal_x: float, focal_y: float,
                c2w: np.ndarray, fineness: int = 1):
    """c2w: (N, 4, 4). Returns rays_o (N, 3) and unit rays_d (N, H, W, 3)."""
    width = np.linspace(0, W / focal_x, int(W / fineness) + 1, dtype=np.float32)
    height = np.linspace(0, H / focal_y, int(H / fineness) + 1, dtype=np.float32)
    y, x = np.meshgrid(height, width, indexing="ij")
    px, py = width[1] - width[0], height[1] - height[0]
    x = (x - W / focal_x / 2 + px / 2)[:-1, :-1]
    y = -(y - H / focal_y / 2 + py / 2)[:-1, :-1]
    dirs = np.stack([x, y, -np.ones_like(x)], axis=-1)  # (H, W, 3) camera frame
    rot = c2w[:, :3, :3].astype(np.float32)             # (N, 3, 3)
    rays_d = np.einsum("nij,hwj->nhwi", rot, dirs)
    rays_o = c2w[:, :3, -1].astype(np.float32)
    norm = np.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, (rays_d / norm).astype(np.float32)


def get_rays_jnp(H: int, W: int, c2w: jnp.ndarray, focal: jnp.ndarray):
    """Device-side twin of :func:`get_rays_np` at fineness=1 (same
    pixel-center convention: x=(i - W/2 + 0.5)/fx, y negated, z=-1, rotate
    by c2w then normalize). c2w (4,4), focal (2,) [fx, fy] ->
    rays_o (1, 3), unit rays_d (H, W, 3). Used by the jitted serving path
    so the camera convention has one source of truth."""
    x = (jnp.arange(W, dtype=jnp.float32) - W / 2 + 0.5) / focal[0]
    y = -(jnp.arange(H, dtype=jnp.float32) - H / 2 + 0.5) / focal[1]
    dirs = jnp.stack([
        jnp.broadcast_to(x[None, :], (H, W)),
        jnp.broadcast_to(y[:, None], (H, W)),
        jnp.full((H, W), -1.0, jnp.float32)], axis=-1)
    rays_d = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], dirs)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return c2w[:3, -1][None], rays_d


def cam_to_world_np(coords: np.ndarray, c2w: np.ndarray,
                    vector: bool = True) -> np.ndarray:
    """Homogeneous transform; vector=True transforms directions (w=0)."""
    pad = np.zeros_like(coords[..., :1]) if vector else np.ones_like(coords[..., :1])
    homo = np.concatenate([coords, pad], axis=-1)
    return np.einsum("...ij,...j->...i", c2w, homo)[..., :3]


# ----------------------------------------------------------- device (jnp) --

def normalize_vector(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Reference: models/utils.py:255-257 (norm + eps in the denominator)."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def cam_to_world(coords: jnp.ndarray, c2w: jnp.ndarray,
                 vector: bool = True) -> jnp.ndarray:
    pad = jnp.zeros_like(coords[..., :1]) if vector else jnp.ones_like(coords[..., :1])
    homo = jnp.concatenate([coords, pad], axis=-1)
    while c2w.ndim < homo.ndim + 1:
        c2w = c2w[..., None, :, :] if c2w.ndim >= 3 else c2w[None]
    return jnp.einsum("...ij,...j->...i", c2w, homo)[..., :3]


def world_to_cam(coords: jnp.ndarray, c2w: jnp.ndarray,
                 vector: bool = True) -> jnp.ndarray:
    return cam_to_world(coords, jnp.linalg.inv(c2w), vector)


def point_ray_geometry(points: jnp.ndarray, rays_o: jnp.ndarray,
                       rays_d: jnp.ndarray, eps: float = 1e-6):
    """Per selected point: decompose (point - origin) along/across the ray.

    Matches reference models/model.py:285-310 ``_calculate_distances``:
    rays are re-normalized with ``normalize_vector`` (note the ``+eps`` in its
    denominator and the ``rays . rays + eps`` in the projection).

    Args:
      points: (..., K, 3) selected points per ray.
      rays_o: broadcastable (..., 3) ray origin.
      rays_d: (..., 3) ray direction (unnormalized accepted).
    Returns:
      proj (..., K, 3): component along the ray (vector "s" in the paper),
      perp (..., K, 3): component across the ray (vector "t"),
      plus their norms (..., K, 1).
    """
    rays = normalize_vector(rays_d, eps=eps)[..., None, :]
    v = points - rays_o[..., None, :]
    t = jnp.sum(v * rays, axis=-1)
    dd = jnp.sum(rays * rays, axis=-1)
    proj = rays * (t / (dd + eps))[..., None]
    perp = v - proj
    perp_dist = jnp.linalg.norm(perp, axis=-1, keepdims=True)
    proj_dist = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    return proj, perp, proj_dist, perp_dist
