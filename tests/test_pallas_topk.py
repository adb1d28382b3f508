"""Pallas fused top-k kernel vs the exact XLA implementation (interpret
mode on CPU; the compiled path is exercised on TPU by bench/e2e runs)."""

import jax.numpy as jnp
import numpy as np

from papr_tpu.ops.pallas_topk import pallas_select_topk
from papr_tpu.ops.topk import select_topk


def _setup(P=4096, R=300, seed=0, dead=None):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(P, 3)).astype(np.float32) * 3
    alive = np.ones(P, bool)
    if dead:
        alive[dead[0]:dead[1]] = False
    o = rng.normal(size=(3,)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return pts, alive, o, d


def test_pallas_topk_matches_exact():
    pts, alive, o, d = _setup(dead=(100, 200))
    k = 20
    got = np.asarray(pallas_select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(o), jnp.asarray(d),
        k, interpret=True))
    want = np.asarray(select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(o), jnp.asarray(d),
        k, chunk=512))
    assert got.shape == want.shape
    assert not np.isin(got, np.arange(100, 200)).any()
    # quantized packing may swap near-ties; demand very high set overlap
    overlap = np.mean([len(set(got[i]) & set(want[i])) / k
                       for i in range(got.shape[0])])
    assert overlap > 0.995, overlap
    # no duplicate winners within a ray
    for row in got[:32]:
        assert len(set(row.tolist())) == len(row)


def test_pallas_topk_nonaligned_sizes():
    # P not a chunk multiple, R not a ray-tile multiple
    pts, alive, o, d = _setup(P=3000, R=77, seed=1)
    got = np.asarray(pallas_select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(o), jnp.asarray(d),
        8, interpret=True))
    want = np.asarray(select_topk(
        jnp.asarray(pts), jnp.asarray(alive), jnp.asarray(o), jnp.asarray(d),
        8, chunk=128))
    assert got.shape == (77, 8)
    assert (got < 3000).all() and (got >= 0).all()
    overlap = np.mean([len(set(got[i]) & set(want[i])) / 8
                       for i in range(77)])
    assert overlap > 0.99, overlap
