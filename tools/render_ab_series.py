"""Sequential render A/B series on the live TPU (VERDICT r4 items 3+4).

Runs PAPR_BENCH=render children one at a time (single TPU client), each
with one knob combination, device-FPS only (PAPR_RENDER_MODES=device keeps
per-arm compiles to the one program being measured). Appends one JSON line
per arm to the output file as soon as the arm lands — a kill mid-series
loses only the in-flight arm.

Usage: python tools/render_ab_series.py [out.jsonl]
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]

ARMS = [
    ("bf16_cap2048", {}),
    ("int8_cap2048", {"PAPR_INT8_EVAL": "1"}),
    ("bf16_cap1024", {"PAPR_CULL_CAND_EVAL": "1024"}),
    ("int8_cap1024", {"PAPR_INT8_EVAL": "1", "PAPR_CULL_CAND_EVAL": "1024"}),
    ("int8_cap512", {"PAPR_INT8_EVAL": "1", "PAPR_CULL_CAND_EVAL": "512"}),
    ("bf16_cap512", {"PAPR_CULL_CAND_EVAL": "512"}),
]


def main(out_path="/tmp/render_ab.jsonl", *only):
    out = pathlib.Path(out_path)
    arms = [a for a in ARMS if not only or a[0] in only]
    for name, env_extra in arms:
        env = dict(os.environ, PAPR_BENCH="render", PAPR_BENCH_CHILD="1",
                   PAPR_RENDER_MODES="device", **env_extra)
        t0 = time.time()
        print(f"arm {name} starting", flush=True)
        try:
            r = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                               capture_output=True, text=True,
                               timeout=1500, env=env, cwd=str(ROOT))
        except subprocess.TimeoutExpired:
            rec = {"arm": name, "error": "timeout", "wall_s": round(time.time() - t0, 1)}
            with out.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"arm {name} TIMED OUT", flush=True)
            continue
        line = None
        for ln in reversed(r.stdout.strip().splitlines()):
            if ln.startswith("{"):
                line = json.loads(ln)
                break
        rec = {"arm": name, "rc": r.returncode,
               "wall_s": round(time.time() - t0, 1), **(line or {})}
        if r.returncode != 0:
            rec["stderr_tail"] = r.stderr[-800:]
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"arm {name} done rc={r.returncode} "
              f"{rec.get('device_fps')} fps ({rec['wall_s']}s)", flush=True)
    print("series complete", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
