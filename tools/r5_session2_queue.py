"""Round-5 (session 2) sequential TPU job queue — one TPU client at a time.

The session restart recycled /tmp and experiments/, so this queue produces
the remaining round-5 hardware evidence end-to-end:

1. quality_r5_t2 train: the second-family quality run (VERDICT r4 item 6) —
   t2 layout (640x1088), 180x180 patches, black bg, prune/grow + LPIPS term
   live, 60k horizon. Durable evidence lands in docs/runs/quality_r5_t2/.
2. test.py held-out metrics on the finished t2 checkpoint (8 test views).
3. cap_quality_ab --views 8 on the t2 checkpoint (VERDICT r4 item 8).
4. int8_quality_ab on the t2 checkpoint, 8 views (int8 eval quality table).
5. bench.py smoke run (verifies the un-killable restructure emits the
   primary JSON line early; captures an r5-vintage number for the README).

Appends one status JSON line per job to /tmp/r5_s2_queue.jsonl; full
stdout/stderr of each job goes to /tmp/r5_s2_<job>.log.
"""

import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = "/tmp/r5_s2_queue.jsonl"

JOBS = [
    ("t2_train", [sys.executable, "train.py", "--opt",
                  "configs/quality_r5_t2.yml"], 3 * 3600),
    ("t2_test", [sys.executable, "test.py", "--opt",
                 "configs/quality_r5_t2.yml"], 3600),
    ("cap_ab", [sys.executable, "tools/cap_quality_ab.py", "--views", "8",
                "configs/quality_r5_t2.yml:experiments/quality_r5_t2"],
     2400),
    ("int8_ab", [sys.executable, "tools/int8_quality_ab.py",
                 "configs/quality_r5_t2.yml", "experiments/quality_r5_t2",
                 "8"], 2400),
    ("bench", [sys.executable, "bench.py"], 1800),
]


def note(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    for name, cmd, budget in JOBS:
        t0 = time.time()
        log = open(f"/tmp/r5_s2_{name}.log", "w")
        try:
            r = subprocess.run(cmd, cwd=str(ROOT), stdout=log,
                               stderr=subprocess.STDOUT, timeout=budget)
            note({"job": name, "ok": r.returncode == 0, "rc": r.returncode,
                  "wall_s": round(time.time() - t0, 1)})
        except subprocess.TimeoutExpired:
            note({"job": name, "ok": False, "rc": "timeout",
                  "wall_s": round(time.time() - t0, 1)})
        except Exception as e:  # keep the queue going
            note({"job": name, "ok": False, "err": str(e)[-500:]})
        finally:
            log.close()


if __name__ == "__main__":
    main()
