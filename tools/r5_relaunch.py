"""Round-5 queue relaunch after the tunnel outage (2026-08-20 ~22:05-??).

Same job list as tools/r5_session2_queue.py, with two changes learned from
the outage:

* Adaptive horizon: training.steps for the t2 run is picked from the time
  remaining to DEADLINE_TS so train + test + A/Bs + bench all fit before
  the driver's end-of-round bench (which must own the TPU alone).
* Hard deadline: every job's timeout is clamped to the time remaining; at
  the deadline the queue stops launching and exits, so a detached queue
  can never outlive the session and contend with the driver's bench.

The adapted config is written to configs/quality_r5_t2_run.yml (same index/
durable_dir as quality_r5_t2 so evidence lands in the committed location).
"""

import json
import pathlib
import re
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = "/tmp/r5_s2_queue.jsonl"
DEADLINE_TS = 1787276388        # round t0 + 4h15m (PROGRESS.jsonl round-5 row)

# Measured on this config family: ~11 steps/s sustained at 180x180/15k pts
# (scaled from the 160x160/10k int8 A/B's 15.7 steps/s), ~25 min of
# compile+evals overhead across a 40-60k run.
STEPS_PER_MIN = 11 * 60
RESERVED_MIN = 55               # test + cap_ab + int8_ab + bench + slack


def left_min():
    return (DEADLINE_TS - time.time()) / 60.0


def note(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run(name, cmd, budget):
    budget = min(budget, max(left_min() * 60, 1))
    t0 = time.time()
    with open(f"/tmp/r5_s2_{name}.log", "w") as log:
        try:
            r = subprocess.run(cmd, cwd=str(ROOT), stdout=log,
                               stderr=subprocess.STDOUT, timeout=budget)
            note({"job": name, "ok": r.returncode == 0, "rc": r.returncode,
                  "wall_s": round(time.time() - t0, 1)})
        except subprocess.TimeoutExpired:
            note({"job": name, "ok": False, "rc": "timeout",
                  "wall_s": round(time.time() - t0, 1)})
        except Exception as e:
            note({"job": name, "ok": False, "err": str(e)[-500:]})


def main():
    train_min = left_min() - RESERVED_MIN
    steps = int(min(60000, max(20000, train_min * STEPS_PER_MIN - 4000)))
    steps = steps // 5000 * 5000        # land on an eval/checkpoint boundary
    note({"job": "plan", "left_min": round(left_min(), 1), "steps": steps})

    src = (ROOT / "configs/quality_r5_t2.yml").read_text()
    (ROOT / "configs/quality_r5_t2_run.yml").write_text(re.sub(
        r"steps: 60000", f"steps: {steps}", src, count=1))

    jobs = [
        ("t2_train", [sys.executable, "train.py", "--opt",
                      "configs/quality_r5_t2_run.yml"], 3 * 3600),
        ("t2_test", [sys.executable, "test.py", "--opt",
                     "configs/quality_r5_t2_run.yml"], 2400),
        ("cap_ab", [sys.executable, "tools/cap_quality_ab.py", "--views",
                    "8", "configs/quality_r5_t2_run.yml:"
                    "experiments/quality_r5_t2"], 1800),
        ("int8_ab", [sys.executable, "tools/int8_quality_ab.py",
                     "configs/quality_r5_t2_run.yml",
                     "experiments/quality_r5_t2", "8"], 1500),
        ("bench", [sys.executable, "bench.py"], 1800),
    ]
    for name, cmd, budget in jobs:
        if left_min() < 3:
            note({"job": name, "ok": False, "rc": "deadline"})
            continue
        run(name, cmd, budget)


if __name__ == "__main__":
    main()
