"""Run the full bench matrix sequentially and collect the JSON lines.

One command for when TPU hardware is (re)available:

    python scripts/bench_matrix.py [--quick]

Runs: headline CC pretraining step, 12-in-1 multitask round-robin,
VQA eval fp/bf16, VQA eval int8 — each in its own subprocess (the compile
cache makes reruns cheap), printing each result line as it lands and a
summary table at the end. --quick lowers the eval batch warmups by running
only the headline + eval pair.
"""

from __future__ import annotations

import json
import subprocess
import sys

MATRIX = [
    ("cc_pretrain", [sys.executable, "bench.py"]),
    ("multitask", [sys.executable, "bench.py", "--multitask"]),
    ("vqa_eval", [sys.executable, "bench.py", "--eval"]),
    ("vqa_eval_int8", [sys.executable, "bench.py", "--eval", "--int8"]),
]


def main() -> None:
    quick = "--quick" in sys.argv
    rows = []
    for name, cmd in MATRIX:
        if quick and name in ("multitask", "vqa_eval_int8"):
            continue
        print(f"== {name}: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines())
             if l.startswith("{")), None,
        )
        if proc.returncode != 0 or line is None:
            print(f"   FAILED rc={proc.returncode}: {proc.stderr[-500:]}",
                  flush=True)
            rows.append((name, None))
            continue
        print("  ", line, flush=True)
        rows.append((name, json.loads(line)))
    print("\n== summary")
    for name, r in rows:
        if r is None:
            print(f"{name:18s} FAILED")
        else:
            print(f"{name:18s} {r['value']:>10.2f} {r['unit']}"
                  f"  ({r['vs_baseline']}x baseline)")


if __name__ == "__main__":
    main()
