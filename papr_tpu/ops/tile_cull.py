"""Tile cone culling: hierarchical top-k selection exploiting ray coherence.

Rays in a 16x16 pixel block span a cone of half-angle delta around the block's
mean direction c. For a point p with v = p - o, alpha = angle(v, c):

    dist(p, ray) = |v| * sin(angle(v, ray)),  angle in [alpha-delta, alpha+delta]

so per tile every ray's point distance is bracketed by

    LB = |v| * min(sin(alpha-delta), sin(alpha+delta))   (0 if alpha < delta)

Soundness: for any ray r in the tile and any point p in r's exact top-k,
LB_p <= dist_r(p), so ranking points by LB and keeping the M smallest keeps
every exact winner whenever at most M points can beat it in lower bound.
(An earlier revision also computed UB and an admissibility threshold
kappa = k-th smallest UB; since admissible == {LB <= kappa} is itself a
smallest-LB prefix, taking the M smallest LB directly selects the same
candidate superset — and drops one (T,P) lax.top_k (a full sort on TPU,
~2.8 ms + pad fusions at 30k pts) plus the UB bound math per step.)
Approximation sources (three, stacked when tpu.cull_prefilter='approx'):
  1. the M-candidate cap (tpu.cull_candidates) truncates by smallest LB;
  2. with prefilter='approx', the candidate prefilter itself uses
     jax.lax.approx_min_k (recall tpu.cull_recall, default 0.99) instead of
     a full per-tile sort, so a true candidate can miss the set even below
     the M cap;
  3. the 16-bit pack quantization shared with ops/pallas_topk.py can swap
     near-ties.
Eval paths (papr.py _attend ``exact_select``) default to the 'packsort'
prefilter: a FULL sort of the packed bounds, exact except for ties the
stage-3 kernel's own pack quantization (source 3) cannot distinguish —
rendered metrics never ride the approx_min_k recall stack.

Pipeline:
  1. (XLA) per tile: center ray, cos(delta); bounds via one (T,3)x(3,P)
     matmul; candidates = M smallest LB per tile (one lax.top_k over (T,P)
     — T is ~256x smaller than R).
  2. (XLA) gather candidate records (v, |v|^2) -> (T, M, 8).
  3. (Pallas) per tile: exact distances to the tile's own rays over M
     candidates, pack-min-extract top-k (same loop as pallas_topk, ~P/M
     times less work). With a sorted prefilter the candidates arrive in
     ascending-LB order, so the kernel processes them in 512-wide chunks
     and EXITS once every ray's k-th best distance provably beats all
     remaining lower bounds — identical output, and on coherent scenes
     most tiles settle within the first chunk (see _cull_kernel).
  4. (XLA) map tile-local winners back to global point indices.

Replaces the same reference behavior (models/model.py:258-283); selection
differences are confined to bound-cap overflow and near-tie quantization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_topk import IDX_MASK, KPAD, MAXI, VAL_MASK

RAY_TILE = 256
CAND_CHUNK = 2048


def _chunk_for(tr: int, m: int = CAND_CHUNK) -> int:
    """Candidate-chunk size for a given ray-tile size and candidate cap M.

    The kernel's working set is the (TR, chunk) packed-distance scratch;
    cap it at the tuned 256x2048 footprint (2 MB int32) so bigger eval
    tiles (block=32 -> TR=1024) don't overflow the 16 MB VMEM scope.
    The chunk also never exceeds M (rounded up to lane alignment): the
    min-extract loop's VPU cost scales with the chunk WIDTH, so an M
    below the VMEM cap must narrow the loop rather than pad back up to
    2048 (pre-round-4 the floor ate the entire tpu.cull_candidates_eval
    saving: M=1024 ran the same 2048-wide loop, docs/status_round4.md).
    Floor 512 keeps the chunk lane-aligned and the fori_loop short.
    """
    m_aligned = max(512, -(-m // 512) * 512)
    return max(512, min((RAY_TILE * CAND_CHUNK) // tr, m_aligned))


def tile_rays(rays_d: jnp.ndarray, block: int = 16):
    """(H, W, 3) -> (T, block*block, 3) pixel-block tiles + metadata.

    H/W are padded to block multiples. Bigger blocks mean fewer tiles (the
    candidate-prefilter sort scales with the tile count) but looser cones
    (the per-tile candidate cap must cover more rays).
    """
    H, W, _ = rays_d.shape
    TR = block * block
    ph = -(-H // block) * block - H
    pw = -(-W // block) * block - W
    padded = jnp.pad(rays_d, ((0, ph), (0, pw), (0, 0)),
                     mode="edge")
    Hp, Wp = H + ph, W + pw
    by, bx = Hp // block, Wp // block
    tiles = padded.reshape(by, block, bx, block, 3).transpose(0, 2, 1, 3, 4)
    return tiles.reshape(by * bx, TR, 3), (H, W, Hp, Wp, block, by, bx)


def untile_indices(idx_tiles: jnp.ndarray, meta) -> jnp.ndarray:
    """(T, RAY_TILE, k) -> (H*W, k) in original row-major ray order."""
    H, W, Hp, Wp, block, by, bx = meta
    k = idx_tiles.shape[-1]
    x = idx_tiles.reshape(by, bx, block, block, k).transpose(0, 2, 1, 3, 4)
    return x.reshape(Hp, Wp, k)[:H, :W].reshape(H * W, k)


def _cull_kernel(rays_ref, f_ref, recs_ref, out_ref, best_scr, work_scr,
                 tmp_scr, done_scr, *, k: int, n_chunks: int, chunk: int,
                 early_exit: bool):
    """Per-tile exact top-k over the tile's candidate set.

    rays_ref (TR,3), f_ref (TR,1), recs_ref (8, M): rows 0..2 = v^T,
    row 3 = |v|^2 (+inf for dead/invalid), row 4 = GLOBAL point index as
    f32, row 5 = the candidate's packed distance LOWER BOUND (VAL_MASK
    bits; +inf for pad slots) when ``early_exit``. Output (TR, KPAD)
    global indices — packing the global index (fits the 15 IDX_BITS,
    P <= 32768) instead of the candidate slot makes the local->global
    remap free; the XLA scalar-gather it replaces cost 148 ms per 800x800
    frame on v5e (one-element rows hit the slow row-DMA path).

    ``early_exit`` (sound, requires candidates sorted by ascending LB —
    the packsort/sort prefilters): after chunk c, if EVERY ray's k-th
    best packed distance is strictly below the packed LB of the first
    candidate of chunk c+1, then for any unseen candidate u,
    q(dist_u) >= q(LB_u) >= q(LB_next) > q(kth) (bit-truncation q is
    monotone on non-negative floats), so u cannot displace any winner
    and the remaining chunks are skipped. Strict `<` keeps quantized
    ties processed, so the result is IDENTICAL to the unexited loop.
    """
    TR = rays_ref.shape[1]
    best_scr[:] = jnp.full((TR, KPAD), MAXI, jnp.int32)
    if early_exit:
        done_scr[0] = 0
    d0 = rays_ref[0, :, 0:1]
    d1 = rays_ref[0, :, 1:2]
    d2 = rays_ref[0, :, 2:3]
    f = f_ref[0]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (TR, KPAD), 1)

    def chunk_work(c):
        base = c * chunk
        v0 = recs_ref[0, 0:1, pl.ds(base, chunk)]
        v1 = recs_ref[0, 1:2, pl.ds(base, chunk)]
        v2r = recs_ref[0, 2:3, pl.ds(base, chunk)]
        vv = recs_ref[0, 3:4, pl.ds(base, chunk)]
        gidx = recs_ref[0, 4:5, pl.ds(base, chunk)].astype(jnp.int32)
        t = d0 * v0 + d1 * v1 + d2 * v2r
        dist = jnp.maximum(vv - t * t * f, 0.0)
        work_scr[:] = (pltpu.bitcast(dist, jnp.int32) &
                       jnp.int32(VAL_MASK)) | gidx
        tmp_scr[:] = jnp.full((TR, KPAD), MAXI, jnp.int32)

        def round_body(j, _):
            w = work_scr[:]
            m = jnp.min(w, axis=1, keepdims=True)
            tmp_scr[:] = jnp.where(lane128 == j, m, tmp_scr[:])
            work_scr[:] = jnp.where(w == m, MAXI, w)
            return 0

        jax.lax.fori_loop(0, k, round_body, 0)
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

    if early_exit:
        def chunk_body(c, _):
            @pl.when(done_scr[0] == 0)
            def _():
                chunk_work(c)
                if n_chunks > 1:
                    # worst settled rank: rays with fewer than k finite
                    # candidates hold MAXI there, which never exits.
                    kth = jnp.max(jnp.where(lane128 < k, best_scr[:],
                                            jnp.int32(0)))
                    # Index written as (scalar % n) * chunk — a bare
                    # multiple of the 512-aligned chunk, so Mosaic can
                    # statically prove lane alignment (the equivalent
                    # ((c+1)*chunk) % (n*chunk) hides it behind the
                    # modulo and fails to compile); the load takes the
                    # chunk's first full 128-lane group for the same
                    # reason and uses element 0.
                    nxt = ((c + 1) % n_chunks) * chunk
                    lbv = recs_ref[0, 5:6, pl.ds(nxt, 128)]     # (1,128)
                    lb_next = (pltpu.bitcast(lbv, jnp.int32) &
                               jnp.int32(VAL_MASK))[0, 0]
                    settled = jnp.logical_and(c + 1 < n_chunks, kth < lb_next)
                    done_scr[0] = settled.astype(jnp.int32)
            return 0
    else:
        def chunk_body(c, _):
            chunk_work(c)
            return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[0] = best_scr[:] & jnp.int32(IDX_MASK)


@functools.partial(jax.jit,
                   static_argnames=("k", "M", "block", "interpret",
                                    "prefilter", "recall_target",
                                    "early_exit"))
def select_topk_culled(points: jnp.ndarray, alive: jnp.ndarray,
                       rays_o: jnp.ndarray, rays_d_hw: jnp.ndarray, k: int,
                       M: int = 2048, block: int = 16, eps: float = 1e-6,
                       interpret: bool = False,
                       prefilter: str = "sort",
                       recall_target: float = 0.99,
                       early_exit: bool = True) -> jnp.ndarray:
    """points (P,3), alive (P,), rays_o (3,), rays_d_hw (H,W,3) ->
    (H*W, k) int32 global indices (row-major ray order)."""
    chunk = _chunk_for(block * block, M)
    # Sorted prefilters enable the kernel's sound early exit; narrow the
    # chunks so the exit has granularity to skip work (a single 2048-wide
    # chunk can never exit). 512 keeps the per-chunk loop efficient.
    early_exit = early_exit and prefilter in ("packsort", "sort")
    if early_exit:
        chunk = min(chunk, 512)
    Mp = max(-(-M // chunk) * chunk, chunk)
    early_exit = early_exit and Mp // chunk > 1
    # The kernel packs GLOBAL point indices into the IDX_MASK low bits
    # (15 bits); a larger cloud would silently select index-mod-32768.
    if points.shape[0] > IDX_MASK + 1:
        raise ValueError(
            f"select_topk_culled packs global point indices into "
            f"{IDX_MASK + 1}-entry index bits; got P={points.shape[0]}. "
            "Use tpu.topk_impl: xla for larger clouds.")
    points = jax.lax.stop_gradient(points).astype(jnp.float32)
    rays_o = jax.lax.stop_gradient(rays_o).astype(jnp.float32)
    rays_d_hw = jax.lax.stop_gradient(rays_d_hw).astype(jnp.float32)

    tiles, meta = tile_rays(rays_d_hw, block)           # (T, TR, 3)
    T = tiles.shape[0]
    unit = tiles / jnp.linalg.norm(tiles, axis=-1, keepdims=True)

    # ---- stage 1: per-tile cone + bounds --------------------------------
    c = jnp.sum(unit, axis=1)
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)  # (T, 3)
    cosd = jnp.min(jnp.einsum("trd,td->tr", unit, c,
                              precision=jax.lax.Precision.HIGHEST), axis=1)
    cosd = jnp.clip(cosd, -1.0, 1.0)
    sind = jnp.sqrt(jnp.maximum(1.0 - cosd * cosd, 0.0))

    v = points - rays_o                                  # (P, 3)
    vnorm2 = jnp.sum(v * v, axis=-1)
    vnorm = jnp.sqrt(vnorm2)                             # (P,)
    t_c = jnp.dot(c, v.T, precision=jax.lax.Precision.HIGHEST)  # (T, P)
    cos_a = t_c / jnp.maximum(vnorm, eps)[None, :]
    cos_a = jnp.clip(cos_a, -1.0, 1.0)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))

    sd, cd = sind[:, None], cosd[:, None]
    sin_lo = sin_a * cd - cos_a * sd                     # sin(alpha - delta)
    sin_hi = sin_a * cd + cos_a * sd                     # sin(alpha + delta)

    crosses_zero = cos_a > cd                            # alpha < delta
    crosses_pi = cos_a < -cd                             # alpha > pi - delta
    lb_sin = jnp.where(crosses_zero | crosses_pi, 0.0,
                       jnp.minimum(jnp.abs(sin_lo), jnp.abs(sin_hi)))

    LB = vnorm[None, :] * lb_sin
    dead = ~alive
    LB = jnp.where(dead[None, :], jnp.inf, LB)

    take = min(Mp, points.shape[0])
    if prefilter == "approx" and take < points.shape[0]:
        # approx_min_k: aggregate-reduction instead of a full per-tile sort.
        # The exact winners have the SMALLEST lower bounds, which the
        # approximate reduction returns most reliably; recall loss only
        # touches the candidate-set boundary, which the M-cap already
        # truncates (tested: selection identity vs exact stays >99%).
        _, cand_idx = jax.lax.approx_min_k(LB, take,
                                           recall_target=recall_target)
    elif prefilter == "packsort":
        # One int32 sort instead of lax.top_k's (f32, s32) variadic pair
        # sort: pack LB (non-negative, so its f32 bits order monotonically)
        # into the SAME VAL_MASK/IDX_BITS layout the stage-3 kernel uses.
        # Ranking ties are then quantized exactly like the kernel's own
        # pack, and the single-array sort measures 30.7 ms vs 39.6 ms for
        # the pair sort at (2500, 30000) on v5e (candidate-set overlap vs
        # the exact pair sort: 99.97%, boundary ties only).
        pidx = jax.lax.broadcasted_iota(jnp.int32, LB.shape, 1)
        packed = (jax.lax.bitcast_convert_type(LB, jnp.int32) &
                  jnp.int32(VAL_MASK)) | pidx
        cand_idx = (jax.lax.sort(packed, dimension=1, is_stable=False)
                    [:, :take] & jnp.int32(IDX_MASK))
    else:
        _, cand_idx = jax.lax.top_k(-LB, take)           # (T, take) smallest LB
    if take < Mp:                                        # tiny clouds: pad
        pad = Mp - take
        cand_idx = jnp.pad(cand_idx, ((0, 0), (0, pad)))

    # ---- stage 2: candidate records -------------------------------------
    rec = jnp.concatenate([v.T, vnorm2[None, :] +
                           jnp.where(alive, 0.0, jnp.inf)[None, :],
                           jnp.zeros((4, points.shape[0]))], axis=0)  # (8, P)
    recs = rec[:, cand_idx.reshape(-1)].reshape(8, T, Mp).transpose(1, 0, 2)
    # Row 4 carries each candidate's GLOBAL index (exact as f32: P <= 2^15);
    # the kernel packs it into the min-extract payload so its output needs
    # no local->global remap.
    recs = recs.at[:, 4, :].set(cand_idx.astype(jnp.float32))
    if early_exit:
        # Row 5: each candidate's SQUARED LB (ascending — the sorted
        # prefilter's order), read by the kernel's early-exit check at
        # chunk edges. Squared because the kernel ranks by squared
        # distance (vv - t^2 f); the eps-fudged f is < 1/|d|^2 so the
        # kernel distance strictly upper-bounds the exact squared
        # distance, which is >= LB^2 — the bound stays sound.
        lb_cand = jnp.take_along_axis(LB, cand_idx, axis=1)
        lb_cand = lb_cand * lb_cand
        if take < Mp:
            lane5 = jnp.arange(Mp)[None, :]
            lb_cand = jnp.where(lane5 >= take, jnp.inf, lb_cand)
        recs = recs.at[:, 5, :].set(lb_cand)
    if take < Mp:
        # pad slots alias index 0: kill their distance so the exact top-k
        # in stage 3 can never select a duplicate
        lane = jnp.arange(Mp)[None, :]
        recs = recs.at[:, 3, :].set(
            jnp.where(lane >= take, jnp.inf, recs[:, 3, :]))

    # per-ray scale factor f
    TR = block * block
    flat = tiles.reshape(T * TR, 3)
    dd = jnp.sum(flat * flat, axis=-1, keepdims=True)
    f = ((dd + 2 * eps) / (dd + eps) ** 2).reshape(T, TR, 1)

    kernel = functools.partial(_cull_kernel, k=k, n_chunks=Mp // chunk,
                               chunk=chunk, early_exit=early_exit)
    winners = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, TR, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Mp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR, KPAD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, TR, KPAD), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TR, KPAD), jnp.int32),
                        pltpu.VMEM((TR, chunk), jnp.int32),
                        pltpu.VMEM((TR, KPAD), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(tiles.reshape(T, TR, 3), f, recs)

    flat_idx = untile_indices(winners[..., :k], meta)    # already global
    return jnp.minimum(flat_idx, points.shape[0] - 1)
