"""Round-5 phase-2 sequential TPU jobs (after the t2 quality run).

Waits for the previous chain (the 60k-step quality_r5_t2 training) to
release the TPU, then one client at a time:

  1. test.py held-out metrics on the finished t2 checkpoint
  2. regenerate both procedural datasets with n_test=8 (train images are
     bit-identical: the generator draws train poses before test poses from
     one RNG stream — papr_tpu/dataset/synth.py)
  3. cap_quality_ab  --views 8 (VERDICT r4 item 8)
  4. int8_quality_ab on both checkpoints (8 views)
  5. profile_render: bf16 defaults, int8+cap512 stacked (VERDICT item 4)
  6. bench.py full orchestrated run (validates the un-killable flow and
     warms .jax_cache for the driver's end-of-round run)

Appends one JSON line per job to /tmp/r5_phase2.jsonl as it lands.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = "/tmp/r5_phase2.jsonl"
WAIT_PID = int(sys.argv[1]) if len(sys.argv) > 1 else 0


def note(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run(name, args, timeout, env_extra=None, tail=1500):
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable] + args, cwd=str(ROOT),
                           capture_output=True, text=True, timeout=timeout,
                           env=dict(os.environ, **(env_extra or {})))
    except subprocess.TimeoutExpired:
        note({"job": name, "ok": False, "err": "timeout",
              "wall_s": round(time.time() - t0, 1)})
        return None
    rec = {"job": name, "ok": r.returncode == 0, "rc": r.returncode,
           "wall_s": round(time.time() - t0, 1),
           "stdout_tail": r.stdout[-tail:]}
    if r.returncode != 0:
        rec["stderr_tail"] = r.stderr[-1200:]
    note(rec)
    return r


def main():
    if WAIT_PID:
        while True:
            try:
                os.kill(WAIT_PID, 0)
            except OSError:
                break
            time.sleep(30)
        note({"job": "wait_chain", "ok": True})

    run("t2_test", ["test.py", "--opt", "configs/quality_r5_t2.yml"], 3600)

    run("regen_quality_sphere",
        ["-m", "papr_tpu.dataset.synth", "--out", "./data/quality_sphere",
         "--size", "512", "--n_train", "40", "--n_test", "8"], 600)
    run("regen_t2_sphere",
        ["-m", "papr_tpu.dataset.synth", "--out", "./data/t2_sphere",
         "--format", "t2", "--height", "1280", "--width", "2176",
         "--n_train", "10", "--n_test", "8"], 900)

    run("cap_quality_ab", ["tools/cap_quality_ab.py", "--views", "8",
                           "experiments/int8ab_bf16/int8ab_bf16.yml:experiments/int8ab_bf16",
                           "configs/quality_r5_t2.yml:experiments/quality_r5_t2"],
        2400, tail=4000)
    run("int8_quality_ab_synth",
        ["tools/int8_quality_ab.py", "experiments/int8ab_bf16/int8ab_bf16.yml",
         "experiments/int8ab_bf16", "8"], 1800, tail=2500)
    run("int8_quality_ab_t2",
        ["tools/int8_quality_ab.py", "configs/quality_r5_t2.yml",
         "experiments/quality_r5_t2", "8"], 1800, tail=2500)

    run("profile_render_bf16", ["tools/profile_render.py"], 1800)
    run("profile_render_int8_cap512", ["tools/profile_render.py"], 1800,
        env_extra={"PAPR_INT8_EVAL": "1", "PAPR_CULL_CAND_EVAL": "512"})

    run("bench_full", ["bench.py"], 1500, tail=2500)
    note({"job": "phase2_done", "ok": True})


if __name__ == "__main__":
    main()
