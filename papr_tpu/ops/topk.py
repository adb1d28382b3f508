"""Top-k nearest-point-to-ray selection.

The reference materializes the perpendicular difference vectors for every
(ray, point) pair — an (N, H, W, num_pts, 3) tensor — and calls torch.topk
(reference: models/model.py:258-283). That is the memory hot spot of the
whole pipeline. The TPU-native formulation never materializes per-pair
vectors: with v_p = p - o shared across the patch (one camera per image),

    dist^2(r, p) = ||v_p||^2 - t^2 * (dd + 2*eps) / (dd + eps)^2,
    t = d_r . v_p,   dd = d_r . d_r,

so the only pairwise quantity is t — a single (R, 3) x (3, P) matmul on the
MXU — and the algebra reproduces the reference's eps placement exactly
(proj = d * (v.d)/(d.d + eps); dist = ||v - proj||). Selection runs on the
squared distance (monotonic, same order).

Rays are processed in chunks via lax.map so the (chunk, P) score block is the
only large temporary. Dead (masked) points get +inf distance, which keeps the
padded point cloud (static shapes across prune/grow) out of every top-k set.

Implementations:
  * "xla":    exact, jax.lax.top_k.
  * "approx": jax.lax.approx_min_k (TPU-optimized; recall ~0.95+). Quality
              knob for speed-critical runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_dist2(points: jnp.ndarray, rays_o: jnp.ndarray,
                   rays_d: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Squared point-to-ray distances. points (P,3), rays_o (3,), rays_d (R,3)
    -> (R, P), computed in fp32 without (R, P, 3) temporaries."""
    points = points.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    v = points - rays_o.astype(jnp.float32)          # (P, 3)
    v2 = jnp.sum(v * v, axis=-1)                     # (P,)
    # exact fp32 (distance ORDERING depends on it; default TPU precision
    # runs fp32 matmuls through bf16 passes)
    t = jnp.dot(rays_d, v.T, precision=jax.lax.Precision.HIGHEST)
    dd = jnp.sum(rays_d * rays_d, axis=-1)           # (R,)
    f = (dd + 2 * eps) / (dd + eps) ** 2             # (R,)
    return v2[None, :] - (t * t) * f[:, None]


def select_topk(points: jnp.ndarray, alive: jnp.ndarray, rays_o: jnp.ndarray,
                rays_d: jnp.ndarray, k: int, eps: float = 1e-6,
                chunk: int = 4096, impl: str = "xla",
                recall_target: float = 0.95) -> jnp.ndarray:
    """Indices of the k alive points nearest each ray.

    Args:
      points: (P, 3) padded point cloud.
      alive:  (P,) bool mask; dead points never selected (unless fewer than k
              alive — callers mask those out downstream via the alive gather).
      rays_o: (3,) camera origin (shared across the ray grid).
      rays_d: (R, 3) flattened ray directions.
    Returns:
      (R, k) int32 indices.
    """
    P = points.shape[0]
    R = rays_d.shape[0]
    dead_bias = jnp.where(alive, 0.0, jnp.inf).astype(jnp.float32)

    def one_chunk(rd):
        d2 = pairwise_dist2(points, rays_o, rd, eps) + dead_bias[None, :]
        if impl == "approx":
            _, idx = jax.lax.approx_min_k(d2, k, recall_target=recall_target)
        else:
            _, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32)

    if R <= chunk:
        return one_chunk(rays_d)
    # Pad to a multiple of the chunk so lax.map sees static shapes.
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    rd = jnp.pad(rays_d, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    idx = jax.lax.map(one_chunk, rd).reshape(n_chunks * chunk, k)
    return idx[:R]


@partial(jax.jit, static_argnames=("k", "chunk", "impl"))
def select_topk_jit(points, alive, rays_o, rays_d, k, eps=1e-6,
                    chunk=4096, impl="xla"):
    return select_topk(points, alive, rays_o, rays_d, k, eps, chunk, impl)
