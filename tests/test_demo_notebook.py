"""demo.ipynb must execute end-to-end on CPU (the reference's demo.ipynb is
its de-facto smoke test — SURVEY.md §4 item 3)."""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_notebook_executes(tmp_path):
    env = dict(os.environ, PAPR_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    out = str(tmp_path / "demo_executed.ipynb")
    try:
        r = subprocess.run(
            [sys.executable, "-m", "jupyter", "nbconvert", "--to", "notebook",
             "--execute", "demo.ipynb", "--output", out,
             "--ExecutePreprocessor.timeout=1500"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-4000:]
        # the demo actually trained and evaluated
        assert os.path.exists(os.path.join(
            REPO, "experiments", "demo", "checkpoint.npz"))
        assert os.path.exists(os.path.join(
            REPO, "experiments", "demo_exposure", "checkpoint.npz"))
    finally:
        for d in ("experiments/demo", "experiments/demo_exposure",
                  "data/demo_sphere"):
            shutil.rmtree(os.path.join(REPO, d), ignore_errors=True)
