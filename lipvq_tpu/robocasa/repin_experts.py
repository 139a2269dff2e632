"""Re-pin the RELIABLE scripted-expert seed matrix.

The pinned (task, seed) pairs in tests/test_scripted_experts.py are
deterministic but placement/physics changes shift the episode RNG
stream, so any sim-layer change invalidates some pins. This tool keeps
still-passing pins and scans forward for replacements:

    python -m lipvq_tpu.robocasa.repin_experts [--scan 15]

Prints a ready-to-paste RELIABLE dict.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=15,
                    help="max seed to scan for replacements")
    ap.add_argument("--tasks", nargs="*", default=None)
    args = ap.parse_args(argv)

    sys.path.insert(0, "tests")
    from test_scripted_experts import RELIABLE, rollout_expert

    new = {}
    for task, seeds in sorted(RELIABLE.items()):
        if args.tasks and task not in args.tasks:
            new[task] = tuple(seeds)
            continue
        want = len(seeds)
        good, tried = [], set()
        t0 = time.time()
        for s in seeds:
            tried.add(s)
            if rollout_expert(task, s):
                good.append(s)
        scan = 0
        while len(good) < want and scan < args.scan:
            if scan not in tried:
                tried.add(scan)
                if rollout_expert(task, scan):
                    good.append(scan)
            scan += 1
        status = "ok" if len(good) >= want else "SHORT"
        print(f"[{status}] {task}: {sorted(good)} "
              f"(kept {[s for s in seeds if s in good]}, "
              f"{time.time()-t0:.0f}s)", flush=True)
        new[task] = tuple(sorted(good))
    print(json.dumps({k: list(v) for k, v in new.items()}, indent=0))
    print("\nRELIABLE = {")
    for k, v in new.items():
        print(f'    "{k}": {tuple(v) if len(v) != 1 else f"({v[0]},)"},')
    print("}")


if __name__ == "__main__":
    main()
