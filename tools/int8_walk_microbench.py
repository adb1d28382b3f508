"""A/B microbenchmark: bf16 vs int8 embedder-walk matmuls in Pallas on TPU.

Motivation (docs/status_round4.md): the eval render's device floor is the
two embedder walks (~249 ms/frame of the 444 ms total), which are stacks of
256-wide dense layers riding the MXU at bf16. v5e's MXU runs int8 at 2x the
bf16 rate, so quantized eval walks are the one named algorithmic lever left
for the 800x800 render headline. This bench measures the REAL kernel-level
speedup including the quantization overhead the int8 path must pay
(per-row dynamic activation scales + per-channel weight scales + int32 ->
fp32 dequant + bias/relu in fp32), on the walk's actual shapes:

    tile rows x 8 layers of 256x256 (the value walk; the key walk is 5).

Usage:  python tools/int8_walk_microbench.py [--rows 1024] [--layers 8]
Prints one JSON line with ms per dispatch for each variant and the ratio.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 256


def _bf16_kernel(c_ref, x_ref, *refs, layers: int):
    w = refs[:layers]
    b = refs[layers:2 * layers]
    out_ref = refs[2 * layers]
    h = (x_ref[:] + c_ref[0, 0]).astype(jnp.bfloat16)
    for i in range(layers):
        z = jnp.dot(h, w[i][:], preferred_element_type=jnp.float32)
        z = jnp.maximum(z + b[i][:], 0.0)
        h = z.astype(jnp.bfloat16)
    out_ref[:] = h.astype(jnp.float32)


def _int8_kernel(c_ref, x_ref, *refs, layers: int):
    # weights pre-quantized int8 with per-output-channel scales
    w = refs[:layers]
    ws = refs[layers:2 * layers]          # (1, D) fp32 per-channel scales
    b = refs[2 * layers:3 * layers]
    out_ref = refs[3 * layers]
    h = x_ref[:] + c_ref[0, 0]             # fp32; carry chains the reps
    for i in range(layers):
        # dynamic per-row activation quantization
        amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        sx = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
        acc = jnp.dot(q, w[i][:], preferred_element_type=jnp.int32)
        z = acc.astype(jnp.float32) * (sx * ws[i][:])
        h = jnp.maximum(z + b[i][:], 0.0)
    out_ref[:] = h


def _int8s_kernel(c_ref, x_ref, *refs, layers: int):
    # static per-layer activation scale (calibrated offline): no per-row
    # amax reduction, just round/clip/cast -> int8 matmul -> dequant
    w = refs[:layers]
    ws = refs[layers:2 * layers]
    b = refs[2 * layers:3 * layers]
    out_ref = refs[3 * layers]
    h = x_ref[:] + c_ref[0, 0]
    sx = 4.0 / 127.0                       # stand-in calibrated scale
    for i in range(layers):
        q = jnp.clip(jnp.round(h * (1.0 / sx)), -127, 127).astype(jnp.int8)
        acc = jnp.dot(q, w[i][:], preferred_element_type=jnp.int32)
        z = acc.astype(jnp.float32) * (sx * ws[i][:])
        h = jnp.maximum(z + b[i][:], 0.0)
    out_ref[:] = h


def _int8raw_kernel(c_ref, x_ref, *refs, layers: int):
    # ceiling probe: activations STAY int8 between layers (relu + clip in
    # int32 with a right-shift stand-in for rescale) — not numerically a
    # real quantized MLP, but the cheapest possible int8 chain
    w = refs[:layers]
    out_ref = refs[3 * layers]
    q = jnp.clip(x_ref[:] + c_ref[0, 0], -127, 127).astype(jnp.int8)
    for i in range(layers):
        acc = jnp.dot(q, w[i][:], preferred_element_type=jnp.int32)
        q = jnp.clip(jnp.maximum(acc // 256, 0), 0, 127).astype(jnp.int8)
    out_ref[:] = q.astype(jnp.float32)


def _run(kind: str, rows: int, layers: int, tiles: int, reps: int) -> float:
    # Timing under the axon tunnel needs three defenses (bench.py:100 and
    # the round-4 session notes): (1) identical dispatches are cached, so
    # every rep gets its own distinct input; (2) block_until_ready can
    # report readiness without the queued work having executed, so the
    # measurement FETCHES a scalar reduction of every output to host;
    # (3) dispatch+fetch has a large fixed floor, so the per-rep time is
    # the SLOPE between a reps-run and a 3*reps-run, not total/n.
    xs = [jax.random.normal(jax.random.PRNGKey(100 + r),
                            (tiles * rows, D), jnp.float32)
          for r in range(3 * reps)]
    x = xs[0]
    ws = [jax.random.normal(jax.random.PRNGKey(i + 1), (D, D), jnp.float32)
          * 0.06 for i in range(layers)]
    bs = [jnp.zeros((1, D), jnp.float32) for _ in range(layers)]
    const = lambda t: (0, 0)
    row = lambda t: (t, 0)
    if kind == "bf16":
        args = ([w.astype(jnp.bfloat16) for w in ws] + bs)
        kern = functools.partial(_bf16_kernel, layers=layers)
        specs = ([pl.BlockSpec((rows, D), row)]
                 + [pl.BlockSpec((D, D), const)] * layers
                 + [pl.BlockSpec((1, D), const)] * layers)
    else:
        scales = [jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
                  for w in ws]
        wq = [jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
              for w, s in zip(ws, scales)]
        args = (wq + scales + bs)
        kfn = {"int8": _int8_kernel, "int8s": _int8s_kernel,
               "int8raw": _int8raw_kernel}[kind]
        kern = functools.partial(kfn, layers=layers)
        specs = ([pl.BlockSpec((rows, D), row)]
                 + [pl.BlockSpec((D, D), const)] * layers
                 + [pl.BlockSpec((1, D), const)] * layers
                 + [pl.BlockSpec((1, D), const)] * layers)

    @jax.jit
    def f(c, x, *a):
        out = pl.pallas_call(
            kern, grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
            out_specs=pl.BlockSpec((rows, D), row),
            out_shape=jax.ShapeDtypeStruct((tiles * rows, D), jnp.float32),
        )(c, x, *a)
        # tiny scalar carry: the next rep's kernel input depends on it, so
        # the runtime cannot elide, cache, or reorder any rep
        return jnp.sum(out[:1, :1]).reshape(1, 1) * 1e-20

    zero = jnp.zeros((1, 1), jnp.float32)
    float(f(zero, x, *args)[0, 0])    # compile + warm

    def timed(n):
        t0 = time.perf_counter()
        c = zero
        for xi in xs[:n]:
            c = f(c, xi, *args)
        s = float(c[0, 0])            # ONE host fetch forces the chain
        assert s == s, "nan"
        return time.perf_counter() - t0

    timed(2)                          # warm the fetch path
    # tunnel jitter is tens of ms; take the median of 5 slopes
    slopes = []
    for _ in range(5):
        t_small = timed(reps)
        t_big = timed(3 * reps)
        slopes.append((t_big - t_small) / (2 * reps) * 1e3)
    slopes.sort()
    return slopes[2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1024)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--tiles", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    a = p.parse_args()
    flops = 2 * a.rows * a.tiles * a.layers * D * D
    out = {"rows": a.rows, "layers": a.layers, "tiles": a.tiles}
    ms_bf16 = _run("bf16", a.rows, a.layers, a.tiles, a.reps)
    out["bf16_ms"] = round(ms_bf16, 3)
    out["bf16_tflops"] = round(flops / ms_bf16 / 1e9, 1)
    for kind in ("int8", "int8s", "int8raw"):
        ms = _run(kind, a.rows, a.layers, a.tiles, a.reps)
        out[f"{kind}_ms"] = round(ms, 3)
        out[f"{kind}_speedup"] = round(ms_bf16 / ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
