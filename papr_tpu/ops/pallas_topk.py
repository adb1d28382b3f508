"""Fused point-to-ray distance + top-k selection as a Pallas TPU kernel.

Why: XLA's ``lax.top_k`` over a (rays, points) distance matrix fully sorts
30k candidates per ray (~280 ms/step measured on v5e at the chair workload);
``approx_min_k`` halves that. This kernel streams point chunks through VMEM,
computes distances on the VPU, and maintains a running top-k per ray with a
pack-min-extract loop — no HBM distance matrix, no sort.

The pack trick: for non-negative fp32 distances the raw bits are
monotonically ordered, so ``(dist_bits & ~0x7FFF) | point_index`` is a single
int32 whose integer order equals distance order (ties broken by index) AND
carries the winner's identity. One ``min`` per extraction round finds both
the value and the index; one ``where`` masks exactly that candidate (the
packed value is unique). Each round is two VPU passes over the chunk.

Cost of the quantization: distances keep 8 mantissa bits (bf16-level
resolution); two points whose distances differ by <0.4% may swap ranks vs
exact top-k. For proximity attention that is a tie in practice; exact
selection remains available via ``tpu.topk_impl: xla``.

Constraints: P (padded point count) <= 32768 (index must fit 15 bits) and a
multiple of the chunk (2048); rays are padded to the ray tile (256).

Reference behavior being replaced: models/model.py:258-283.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 256
POINT_CHUNK = 2048
KPAD = 128          # output/scratch lane width; first k entries valid
IDX_BITS = 15
IDX_MASK = (1 << IDX_BITS) - 1   # 0x7FFF
VAL_MASK = -(1 << IDX_BITS)      # 0xFFFF8000 as two's-complement int32
MAXI = 0x7FFFFFFF  # plain int: jnp scalars become captured consts in pallas


def _topk_kernel(rays_ref, f_ref, vT_ref, v2_ref, out_ref, best_scr,
                 work_scr, tmp_scr, *, k: int, n_chunks: int):
    TR = rays_ref.shape[0]
    best_scr[:] = jnp.full((TR, KPAD), MAXI, jnp.int32)

    d0 = rays_ref[:, 0:1]
    d1 = rays_ref[:, 1:2]
    d2 = rays_ref[:, 2:3]
    f = f_ref[:]                                   # (TR, 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (TR, KPAD), 1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (TR, POINT_CHUNK), 1)

    def chunk_body(c, _):
        base = c * POINT_CHUNK
        v0 = vT_ref[0:1, pl.ds(base, POINT_CHUNK)]     # (1, PC)
        v1 = vT_ref[1:2, pl.ds(base, POINT_CHUNK)]
        v2r = vT_ref[2:3, pl.ds(base, POINT_CHUNK)]
        vv = v2_ref[0:1, pl.ds(base, POINT_CHUNK)]
        t = d0 * v0 + d1 * v1 + d2 * v2r               # (TR, PC) via VPU FMAs
        dist = jnp.maximum(vv - t * t * f, 0.0)
        work_scr[:] = (pltpu.bitcast(dist, jnp.int32) &
                       jnp.int32(VAL_MASK)) | (col0 + base)

        # Per-ray admission threshold: the current kth-best. Any candidate
        # >= tau cannot enter the final top-k, so extraction rounds stop as
        # soon as every ray's chunk-minimum clears it (after the first chunk
        # most chunks terminate in a handful of rounds).
        tau = best_scr[:, k - 1:k]                              # (TR, 1)
        any_useful = jnp.any(jnp.min(work_scr[:], axis=1, keepdims=True) < tau)

        @pl.when(any_useful)
        def _process_chunk():
            # Chunk-local top-k: rounds of (min, write slot j, mask winner),
            # mutating scratch in place (loop-carried big values would copy).
            tmp_scr[:] = jnp.full((TR, KPAD), MAXI, jnp.int32)

            def cond(st):
                j, done = st
                return jnp.logical_and(j < k, jnp.logical_not(done))

            def body(st):
                j, _ = st
                w = work_scr[:]
                m = jnp.min(w, axis=1, keepdims=True)           # (TR, 1)
                tmp_scr[:] = jnp.where(lane128 == j, m, tmp_scr[:])
                work_scr[:] = jnp.where(w == m, MAXI, w)
                done = jnp.logical_not(jnp.any(m < tau))
                return j + 1, done

            jax.lax.while_loop(cond, body, (0, False))

            # Merge with the running best over a width-2*KPAD candidate row
            # (small: value-carried is fine here).
            cat0 = jnp.concatenate([best_scr[:], tmp_scr[:]], axis=1)

            def merge_body(j, carry):
                cat, nb = carry
                m = jnp.min(cat, axis=1, keepdims=True)
                nb = jnp.where(lane128 == j, m, nb)
                cat = jnp.where(cat == m, MAXI, cat)
                return cat, nb

            nb0 = jnp.full((TR, KPAD), MAXI, jnp.int32)
            _, newbest = jax.lax.fori_loop(0, k, merge_body, (cat0, nb0))
            best_scr[:] = newbest
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[:] = best_scr[:] & jnp.int32(IDX_MASK)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_select_topk(points: jnp.ndarray, alive: jnp.ndarray,
                       rays_o: jnp.ndarray, rays_d: jnp.ndarray, k: int,
                       eps: float = 1e-6, interpret: bool = False) -> jnp.ndarray:
    """(P,3) points, (P,) alive, (3,) origin, (R,3) dirs -> (R,k) int32.

    Same selection semantics as ops.topk.select_topk up to the documented
    distance quantization.
    """
    P = points.shape[0]
    R = rays_d.shape[0]
    assert k <= KPAD
    if P > (1 << IDX_BITS):
        raise ValueError(f"pallas topk supports <= {1 << IDX_BITS} points, got {P}")

    # Selection is non-differentiable (the reference also only differentiates
    # through the gathered values); keep autodiff out of the kernel.
    points = jax.lax.stop_gradient(points)
    rays_o = jax.lax.stop_gradient(rays_o)
    rays_d = jax.lax.stop_gradient(rays_d)

    # Host-side (XLA) prep: per-point v, |v|^2 (+inf for dead), per-ray scale.
    Ppad = -(-P // POINT_CHUNK) * POINT_CHUNK
    v = points.astype(jnp.float32) - rays_o.astype(jnp.float32)
    v2 = jnp.sum(v * v, axis=-1) + jnp.where(alive, 0.0, jnp.inf)
    vT = jnp.pad(v.T, ((0, 0), (0, Ppad - P)))                  # (3, Ppad)
    v2 = jnp.pad(v2[None, :], ((0, 0), (0, Ppad - P)),
                 constant_values=jnp.inf)                       # (1, Ppad)

    Rpad = -(-R // RAY_TILE) * RAY_TILE
    rd = jnp.pad(rays_d.astype(jnp.float32), ((0, Rpad - R), (0, 0)))
    dd = jnp.sum(rd * rd, axis=-1, keepdims=True)
    f = (dd + 2 * eps) / (dd + eps) ** 2                        # (Rpad, 1)

    kernel = functools.partial(_topk_kernel, k=k,
                               n_chunks=Ppad // POINT_CHUNK)
    out = pl.pallas_call(
        kernel,
        grid=(Rpad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Ppad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ppad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE, KPAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rpad, KPAD), jnp.int32),
        scratch_shapes=[pltpu.VMEM((RAY_TILE, KPAD), jnp.int32),
                        pltpu.VMEM((RAY_TILE, POINT_CHUNK), jnp.int32),
                        pltpu.VMEM((RAY_TILE, KPAD), jnp.int32)],
        interpret=interpret,
    )(rd, f, vT, v2)
    idx = out[:R, :k]
    return jnp.minimum(idx, P - 1)  # padded slots can't win; clamp for safety
