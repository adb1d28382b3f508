"""Training-component tests: schedules and Adam vs torch, top-k vs brute
force, prune/grow semantics, checkpoint roundtrip, config merge vs the
reference's update_dict."""

import copy
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import yaml

from papr_tpu.config import Config, load_config, merge_config
from papr_tpu.ops.topk import pairwise_dist2, select_topk
from papr_tpu.train.optim import GroupSpec, apply_updates, init_opt_state
from papr_tpu.train.schedules import make_schedule


# ----------------------------------------------------------------- topk ----

def test_pairwise_dist2_matches_direct():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 2
    o = rng.normal(size=(3,)).astype(np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    eps = 1e-6
    got = np.asarray(pairwise_dist2(jnp.asarray(pts), jnp.asarray(o),
                                    jnp.asarray(d), eps))
    # direct formula (reference models/model.py:276-279)
    v = pts[None] - o
    proj = d[:, None] * (np.sum(v * d[:, None], -1)
                         / (np.sum(d * d, -1)[:, None] + eps))[..., None]
    want = np.sum((v - proj) ** 2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_select_topk_excludes_dead_and_chunks():
    rng = np.random.default_rng(1)
    P, R, k = 200, 100, 8
    pts = rng.normal(size=(P, 3)).astype(np.float32)
    alive = np.ones(P, bool)
    alive[50:100] = False
    o = np.zeros(3, np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    idx = np.asarray(select_topk(jnp.asarray(pts), jnp.asarray(alive),
                                 jnp.asarray(o), jnp.asarray(d), k,
                                 chunk=32))
    assert idx.shape == (R, k)
    assert not np.isin(idx, np.arange(50, 100)).any()
    # matches numpy brute force on alive points
    v = pts[None] - o
    dist = np.linalg.norm(v - d[:, None] * np.sum(v * d[:, None], -1,
                                                  keepdims=True), axis=-1)
    dist[:, ~alive] = np.inf
    want = np.sort(np.argsort(dist, axis=1)[:, :k], axis=1)
    np.testing.assert_array_equal(np.sort(idx, axis=1), want)


# ------------------------------------------------------------- schedules ----

def _torch_lr_trace(kind, base_lr, warmup, max_steps, gamma=0.9, n=None):
    import torch.optim.lr_scheduler as ls
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    warm = ls.LinearLR(opt, start_factor=1e-16 if warmup > 0 else 1.0,
                       end_factor=1.0, total_iters=warmup)
    if kind == "linear":
        decay = ls.LinearLR(opt, start_factor=1.0, end_factor=0.0,
                            total_iters=max_steps - warmup)
    elif kind == "cosine":
        decay = ls.CosineAnnealingLR(opt, T_max=max(max_steps - warmup, 1))
    elif kind == "cosine-hlfperiod":
        decay = ls.CosineAnnealingLR(opt, T_max=max(max_steps - warmup, 1) * 2)
    elif kind == "exp":
        decay = ls.ExponentialLR(opt, gamma=gamma)
    elif kind == "stop":
        decay = ls.StepLR(opt, step_size=1, gamma=0.0)
    sched = ls.SequentialLR(opt, schedulers=[warm, decay], milestones=[warmup])
    out = []
    for _ in range(n or max_steps):
        out.append(opt.param_groups[0]["lr"])
        sched.step()
    return np.array(out)


@pytest.mark.parametrize("kind", ["linear", "cosine", "cosine-hlfperiod",
                                  "exp", "stop"])
def test_schedule_matches_torch(kind):
    max_steps, warmup, base = 50, 10, 3e-4
    cfg = Config({"type": kind, "base_lr": base, "warmup": warmup,
                  "gamma": 0.9})
    fn = make_schedule(cfg, max_steps)
    got = np.array([float(fn(t)) for t in range(max_steps)])
    want = _torch_lr_trace(kind, base, warmup, max_steps)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-20)


def test_schedule_none_constant():
    cfg = Config({"type": "none", "base_lr": 1e-3, "warmup": 0})
    fn = make_schedule(cfg, 100, lr_factor=0.5)
    assert float(fn(0)) == float(fn(99)) == pytest.approx(5e-4)


# ------------------------------------------------------------------ adam ----

def test_adam_matches_torch():
    rng = np.random.default_rng(2)
    p0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) for _ in range(8)]
    wd = 0.01
    lr = 1e-3

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    spec = {"attn": GroupSpec("attn", lambda s: jnp.float32(lr), wd)}
    params = {"attn": {"w": jnp.asarray(p0)}}
    opt_state = init_opt_state(params, spec)
    for i, g in enumerate(grads):
        params, opt_state = apply_updates(
            params, {"attn": {"w": jnp.asarray(g)}}, opt_state, spec, i)
    np.testing.assert_allclose(np.asarray(params["attn"]["w"]),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------- prune / grow ----

def _tiny_cfg():
    return load_config(overrides={
        "use_amp": False, "max_num_pts": 40,
        "geoms": {"points": {"select_k": 4, "init_num": 30}},
        "models": {"attn": {"d_model": 16, "embed": {
            "k_L": [2, 2, 2], "q_L": [2], "v_L": [2, 2],
            "key": {"d_ff": 8, "d_ff_out": 8, "n_ff_layer": 2},
            "query": {"d_ff": 8, "d_ff_out": 8, "n_ff_layer": 2},
            "value": {"d_ff": 8, "d_ff_out": 8, "n_ff_layer": 2}}}},
    })


def test_prune_and_grow_static_shapes():
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.points_host import add_points, prune_points

    cfg = _tiny_cfg()
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    assert params["points"].shape == (40, 3)
    assert int(np.asarray(state["alive"]).sum()) == 30

    # make some scores negative -> pruned by '<' rule with thresh 0
    influ = np.asarray(params["points_influ_scores"]).copy()
    influ[5:15] = -1.0
    influ[:5] = 1.0
    influ[15:] = 1.0
    params = dict(params)
    params["points_influ_scores"] = jnp.asarray(influ)
    params, state, n_pruned = prune_points(params, state, 0.0, "<")
    assert n_pruned == 10
    assert int(np.asarray(state["alive"]).sum()) == 20
    assert params["points"].shape == (40, 3)  # static!

    rng = np.random.default_rng(0)
    params, state, n_added = add_points(params, state, cfg, 15, rng)
    assert n_added == 15
    assert int(np.asarray(state["alive"]).sum()) == 35
    # growth caps at the padded size
    params, state, n_added = add_points(params, state, cfg, 50, rng)
    assert n_added == 5


def test_pointgrow_comb_types():
    from papr_tpu.model.pointgrow import add_points_knn
    rng = np.random.default_rng(3)
    coords = rng.normal(size=(30, 3)).astype(np.float32)
    influ = rng.normal(size=(30, 1)).astype(np.float32)
    feats = rng.normal(size=(30, 4)).astype(np.float32)
    for comb in ("duplicate", "mean", "random", "random-softmax", "weighted"):
        for samp in ("random", "top-knn-std", "top-knn-mean", "top-knn-max",
                     "top-knn-min", "influ-scores-max", "influ-scores-min"):
            nc, n, ni, nf = add_points_knn(
                coords, influ, add_num=5, k=3, comb_type=comb,
                sample_type=samp, sample_k=4, point_features=feats, rng=rng)
            assert n == 5 and nc.shape == (5, 3) and ni.shape == (5, 1)
            assert nf.shape == (5, 4)
            if comb == "mean":
                assert np.isfinite(nc).all()


# ------------------------------------------------------------ checkpoints ----

def test_checkpoint_roundtrip(tmp_path):
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.checkpoint import load_checkpoint, restore_into, save_checkpoint
    from papr_tpu.train.step import make_opt_state

    cfg = _tiny_cfg()
    params, state = create_model(cfg, jax.random.PRNGKey(1))
    opt_state = make_opt_state(cfg, params)
    save_checkpoint(str(tmp_path), 123, params, opt_state, state,
                    histories={"train_losses": [1.0, 0.5]})
    step, tree = load_checkpoint(str(tmp_path))
    assert step == 123
    params2 = restore_into(params, tree["params"])
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    opt2 = restore_into(opt_state, tree["opt_state"])
    assert jax.tree.structure(opt_state) == jax.tree.structure(opt2)


# ---------------------------------------------------------------- config ----

def test_config_merge_matches_reference_for_all_scenes():
    import sys
    sys.path.insert(0, "/root/reference")
    if not os.path.exists("/root/reference/utils.py"):
        pytest.skip("reference unavailable")
    from utils import update_dict as ref_update_dict  # reference impl

    with open("/root/reference/configs/default.yml") as f:
        ref_default = yaml.safe_load(f)
    for scene in sorted(glob.glob("/root/reference/configs/*/*.yml")):
        with open(scene) as f:
            overrides = yaml.safe_load(f)
        ref_merged = copy.deepcopy(ref_default)
        ref_update_dict(ref_merged, copy.deepcopy(overrides))
        ours = copy.deepcopy(ref_default)
        merge_config(ours, copy.deepcopy(overrides))
        assert ours == ref_merged, scene


def test_our_scene_configs_equal_reference_scene_configs():
    """The re-emitted YAMLs carry identical data."""
    for scene in sorted(glob.glob("/root/reference/configs/*/*.yml")):
        rel = os.path.relpath(scene, "/root/reference/configs")
        with open(scene) as f:
            ref = yaml.safe_load(f)
        with open(os.path.join("configs", rel)) as f:
            ours = yaml.safe_load(f)
        assert ours == ref, rel
