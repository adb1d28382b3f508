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
