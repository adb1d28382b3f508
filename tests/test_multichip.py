"""Multi-device training: the real train.py CLI on a virtual 8-device CPU
mesh (SURVEY.md §4's CPU-simulated multi-device strategy).

The (data=2, rays=4) run must produce the same losses as the single-device
run — the mesh is an execution layout, not a semantics change. This is the
SPMD analogue of the reference's tile loop (reference train.py:59-70).
"""

import os
import re
import subprocess
import sys

import pytest

from test_cli_end2end import _write_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_train(cfg_path, n_devices):
    env = dict(os.environ, PAPR_PLATFORM="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}")
    r = subprocess.run([sys.executable, "train.py", "--opt", cfg_path],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, (f"train.py on {n_devices} devices\n"
                               f"STDOUT:{r.stdout[-3000:]}\n"
                               f"STDERR:{r.stderr[-3000:]}")
    return r.stdout


def _final_eval_losses(out):
    m = re.findall(r"Eval step: (\d+) train_loss: ([\d.eE+-]+) "
                   r"eval_loss: ([\d.eE+-]+) eval_psnr: ([\d.eE+-]+)", out)
    assert m, out[-2000:]
    step, train_loss, eval_loss, _ = m[-1]
    return int(step), float(train_loss), float(eval_loss)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from papr_tpu.dataset.synth import make_demo_scene
    return make_demo_scene(str(tmp_path_factory.mktemp("scene") / "s"),
                           n_train=4, n_test=1, H=24, W=24)


def test_mesh_train_matches_single_device(scene, tmp_path_factory):
    # batch 2 over data axis, 16 patch rows over 4-way rays axis. Prune/grow
    # off for the parity assertion: pruning thresholds discretize tiny
    # reduction-order differences into different point sets (exercised in
    # test_mesh_train_with_prune_grow instead).
    common = {"dataset": {"batch_size": 2},
              "training": {"prune_steps": 0, "add_steps": 0}}

    tmp1 = tmp_path_factory.mktemp("run1")
    cfg1 = _write_cfg(tmp1, scene, **common)
    out1 = _run_train(cfg1, 1)

    tmp8 = tmp_path_factory.mktemp("run8")
    cfg8 = _write_cfg(tmp8, scene, **common,
                      tpu={"mesh": {"data": 2, "rays": 4}})
    out8 = _run_train(cfg8, 8)
    assert "Multi-chip: mesh=(data=2, rays=4) over 8 devices" in out8

    s1, tl1, el1 = _final_eval_losses(out1)
    s8, tl8, el8 = _final_eval_losses(out8)
    assert s1 == s8
    assert tl8 == pytest.approx(tl1, rel=1e-4, abs=1e-6)
    assert el8 == pytest.approx(el1, rel=1e-4, abs=1e-6)


def test_mesh_train_with_prune_grow(scene, tmp_path_factory):
    """Prune + grow on the mesh: the host rebuild must re-replicate params
    and optimizer state over the devices and keep training."""
    tmp8 = tmp_path_factory.mktemp("run8pg")
    cfg8 = _write_cfg(tmp8, scene, dataset={"batch_size": 2},
                      tpu={"mesh": {"data": 2, "rays": 4}})
    out8 = _run_train(cfg8, 8)
    assert "Pruned" in out8 and "Added" in out8
    assert "Training finished!" in out8
    _, tl8, el8 = _final_eval_losses(out8)
    assert tl8 == tl8 and el8 == el8  # finite, parsed


def test_attend_spmd_kernel_path_parity():
    """The Pallas fast path (streamrec kernels + cull top-k, interpret mode
    on CPU) under shard_map over a (2, 4) mesh must match the single-device
    local trace exactly (fwd) and to reduction-order noise (grads).

    This is VERDICT r2 #1: multi-chip runs must keep the measured kernel
    path instead of demoting to unfused XLA."""
    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np

    from papr_tpu.config import load_config
    from papr_tpu.model.papr import _attend, _attend_spmd, create_model
    from papr_tpu.nn.mlp import policy_from_config
    from papr_tpu.parallel.mesh import make_mesh

    cfg = load_config(overrides={
        "use_amp": False, "max_num_pts": 256,
        "geoms": {"points": {"init_num": 200, "select_k": 8}},
        "dataset": {"batch_size": 2, "patches": {"height": 16, "width": 16}},
        "tpu": {"fused_attn": "streamrec", "topk_impl": "cull",
                "mesh": {"data": 2, "rays": 4}},
    })
    policy = policy_from_config(cfg)
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    rayo = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32) * 3.0)
    rayd = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    rayd = jnp.asarray(rayd)
    mesh = make_mesh(2, 4)

    def loss_of(fused, attn):
        return jnp.sum(fused ** 2) + jnp.sum(attn[..., -1] ** 2)

    def ref_loss(p, s):
        f, a, _, _ = _attend(p, s, cfg, rayo, rayd, policy, remat=False,
                             local=True)
        return loss_of(f, a)

    def spmd_loss(p, s):
        f, a, _, _ = _attend_spmd(p, s, cfg, rayo, rayd, policy, False, mesh)
        return loss_of(f, a)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f_ref, a_ref, _, i_ref = jax.jit(
            lambda p, s: _attend(p, s, cfg, rayo, rayd, policy, remat=False,
                                 local=True))(params, state)
        g_ref = jax.jit(jax.grad(ref_loss))(params, state)
    with jax.set_mesh(mesh):
        f_sp, a_sp, _, i_sp = jax.jit(
            lambda p, s: _attend_spmd(p, s, cfg, rayo, rayd, policy,
                                      False, mesh))(params, state)
        g_sp = jax.jit(jax.grad(spmd_loss))(params, state)

    assert bool(jnp.all(i_ref == i_sp)), "selection changed under shard_map"
    assert float(jnp.max(jnp.abs(f_ref - f_sp))) < 1e-5
    assert float(jnp.max(jnp.abs(a_ref - a_sp))) < 1e-6
    worst = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_ref, g_sp)))
    assert worst < 1e-4, worst


def test_mesh_kernel_path_train_matches_single_device(scene, tmp_path_factory):
    """The real train.py CLI with the kernel path pinned explicitly
    (streamrec + cull): the 8-device mesh run (kernels inside shard_map)
    must match the 1-device kernel run's losses."""
    common = {"dataset": {"batch_size": 2},
              "training": {"prune_steps": 0, "add_steps": 0}}
    kern = {"fused_attn": "streamrec", "topk_impl": "cull"}

    tmp1 = tmp_path_factory.mktemp("krun1")
    cfg1 = _write_cfg(tmp1, scene, **common, tpu=kern)
    out1 = _run_train(cfg1, 1)

    tmp8 = tmp_path_factory.mktemp("krun8")
    cfg8 = _write_cfg(tmp8, scene, **common,
                      tpu={**kern, "mesh": {"data": 2, "rays": 4}})
    out8 = _run_train(cfg8, 8)

    s1, tl1, el1 = _final_eval_losses(out1)
    s8, tl8, el8 = _final_eval_losses(out8)
    assert s1 == s8
    assert tl8 == pytest.approx(tl1, rel=1e-4, abs=1e-6)
    # eval renders shard the tile list over the mesh and keep the kernels
    # (_sharded_tile_attend) — same kernel path as the 1-device run.
    assert el8 == pytest.approx(el1, rel=1e-4, abs=1e-6)


def test_mesh_render_kernel_path_parity():
    """Sharded tile render over a (2, 4) mesh (kernel path: streamrec +
    cull, interpret mode on CPU) must match the single-device kernel render
    exactly — the tile list is spread over the mesh and each device runs the
    same per-tile trace (VERDICT r3 #1: multi-device hosts keep the kernels
    on the eval/render path; reference's tiled eval is test.py:76-87).

    The 19x22 image with 8x10 tiles gives 3x3=9 tiles over 8 devices,
    exercising the wrap-padding AND the non-tile-multiple edge crop."""
    import warnings

    import jax
    import numpy as np

    from papr_tpu.config import load_config
    from papr_tpu.model.papr import create_model
    from papr_tpu.train.step import render_full_image

    overrides = {
        "use_amp": False, "max_num_pts": 256,
        "geoms": {"points": {"init_num": 200, "select_k": 8}},
    }
    kern = {"fused_attn": "streamrec", "topk_impl": "cull"}
    cfg_local = load_config(overrides={**overrides,
                                       "tpu": {**kern, "force_local": True}})
    cfg_mesh = load_config(overrides={
        **overrides, "tpu": {**kern, "mesh": {"data": 2, "rays": 4}}})

    params, state = create_model(cfg_local, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    rayo = rng.normal(size=(1, 3)).astype(np.float32) * 3.0
    rayd = rng.normal(size=(1, 19, 22, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out_l = render_full_image(params, state, cfg_local, rayo, rayd,
                                  8, 10, with_depth=True)
        out_m = render_full_image(params, state, cfg_mesh, rayo, rayd,
                                  8, 10, with_depth=True)
    for k in ("rgb", "bkg_attn", "depth"):
        np.testing.assert_allclose(out_m[k], out_l[k], atol=1e-5,
                                   err_msg=k)


def test_mesh_divisibility_errors(scene, tmp_path):
    cfg = _write_cfg(tmp_path, scene,  # batch_size defaults to 1: not % 2
                     tpu={"mesh": {"data": 2, "rays": 4}})
    env = dict(os.environ, PAPR_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run([sys.executable, "train.py", "--opt", cfg],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode != 0
    assert "must be divisible by" in r.stderr


def test_mesh_train_step_with_lpips_runtime_params():
    """LPIPS train step on a (2, 4) mesh: the VGG backbone rides in as a
    runtime pytree replicated over the mesh (make_train_step's loss_rt
    device_put) — must produce a finite loss that matches the single-device
    step on identical inputs."""
    import jax
    import numpy as np

    from papr_tpu.config import load_config
    from papr_tpu.model.lpips_jax import random_lpips_params
    from papr_tpu.model.papr import create_model
    from papr_tpu.nn.mlp import policy_from_config
    from papr_tpu.parallel.mesh import make_mesh, make_plan
    from papr_tpu.train.losses import get_loss
    from papr_tpu.train.step import make_opt_state, make_train_step

    overrides = {
        "use_amp": False, "max_num_pts": 128, "seed": 0,
        "geoms": {"points": {"init_num": 100, "select_k": 4}},
        "dataset": {"batch_size": 2, "patches": {"height": 16, "width": 16}},
        "training": {"losses": {"mse": 1.0, "lpips": 0.01,
                                "lpips_alex": 0.0}},
    }
    cfg = load_config(overrides=overrides)
    lp = random_lpips_params(jax.random.PRNGKey(1))
    loss_fn = get_loss(cfg.training.losses, lpips_params=lp,
                       policy=policy_from_config(cfg))
    params, state = create_model(cfg, jax.random.PRNGKey(0))
    opt = make_opt_state(cfg, params)

    rng = np.random.default_rng(0)
    rayo = rng.normal(size=(2, 3)).astype(np.float32) * 3.0
    rayd = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    target = rng.random((2, 16, 16, 3), np.float32)
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()

    plan = make_plan(make_mesh(2, 4))
    step_m, _ = make_train_step(cfg, loss_fn=loss_fn, sharding=plan,
                                donate=False)
    _, _, loss_m, _ = step_m(params, opt, state, rayo, rayd, target, c2w, 0)

    step_1, _ = make_train_step(cfg, loss_fn=loss_fn, donate=False)
    _, _, loss_1, _ = step_1(params, opt, state, rayo, rayd, target, c2w, 0)

    assert np.isfinite(float(loss_m))
    np.testing.assert_allclose(float(loss_m), float(loss_1), rtol=1e-4)
