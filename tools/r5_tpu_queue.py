"""Round-5 sequential TPU job queue (one TPU client at a time).

1. int8_train A/B int8 arm (the bf16 arm landed in /tmp/int8_train_ab.jsonl
   before the session restart; the int8 arm was killed at step 9400/10000).
2. quality_r5_t2: the second-family quality run (VERDICT r4 item 6) —
   t2 layout, 180x180 patches, black bg, 60k horizon, prune/grow + LPIPS.
3. test.py held-out metrics on the finished t2 checkpoint.

Appends one status JSON line per job to /tmp/r5_queue.jsonl as it lands.
"""

import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = "/tmp/r5_queue.jsonl"


def note(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    # Job 1: int8 arm (~26 min)
    sys.path.insert(0, str(ROOT / "tools"))
    from int8_train_ab import run_arm
    t0 = time.time()
    try:
        run_arm("int8", 10000, "  int8_train: true\n",
                "/tmp/int8_train_ab.jsonl")
        note({"job": "int8_arm", "ok": True,
              "wall_s": round(time.time() - t0, 1)})
    except Exception as e:  # keep the queue going
        note({"job": "int8_arm", "ok": False, "err": str(e)[-500:]})

    # Job 2: t2 quality run (~2-2.5 h)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "train.py", "--opt", "configs/quality_r5_t2.yml"],
        cwd=str(ROOT), capture_output=True, text=True, timeout=6 * 3600)
    note({"job": "quality_r5_t2_train", "ok": r.returncode == 0,
          "rc": r.returncode, "wall_s": round(time.time() - t0, 1),
          "stderr_tail": r.stderr[-800:] if r.returncode else ""})

    # Job 3: held-out test metrics
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "test.py", "--opt", "configs/quality_r5_t2.yml"],
        cwd=str(ROOT), capture_output=True, text=True, timeout=3600)
    note({"job": "quality_r5_t2_test", "ok": r.returncode == 0,
          "rc": r.returncode, "wall_s": round(time.time() - t0, 1),
          "stdout_tail": r.stdout[-1200:],
          "stderr_tail": r.stderr[-800:] if r.returncode else ""})


if __name__ == "__main__":
    main()
