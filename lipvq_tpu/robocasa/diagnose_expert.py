"""Per-phase failure diagnostics for scripted experts.

`bench_expert_success` gives a per-task success *rate*; this tool says
*where* the failures happen: for each seed it replays the phase machine
recording every phase visit (steps spent, exit reason) plus the success
flag, then aggregates phase-exit histograms over the failing seeds.

    python -m lipvq_tpu.robocasa.diagnose_expert --task PreSoakPan \
        --seeds 20 [--verbose]
"""

from __future__ import annotations

import argparse
import collections
import json
import time


def trace_rollout(task, seed, max_steps=1700):
    from lipvq_tpu.robocasa.sim import REGISTERED_KITCHEN_ENVS
    from lipvq_tpu.robocasa.sim.scripted import make_scripted_policy

    env = REGISTERED_KITCHEN_ENVS[task](seed=seed)
    visits = []  # (phase_name, steps_spent, exit_reason)
    try:
        env.reset()
        pol = make_scripted_policy(task, env)
        prev_idx, prev_t = 0, 0
        success_step = None
        for step in range(max_steps):
            a = pol.get_action()
            # phase transitions happened inside get_action; log them
            if pol._phases is not None and pol._idx != prev_idx:
                name = (pol._phases[prev_idx].name
                        if prev_idx < len(pol._phases) else "<end>")
                budget = (pol._phases[prev_idx].budget
                          if prev_idx < len(pol._phases) else 0)
                reason = "budget" if prev_t >= budget else "done"
                visits.append((name, prev_t, reason))
                prev_idx, prev_t = pol._idx, pol._t
            prev_t = pol._t
            _, _, _, info = env.step(a)
            if info["is_success"]["task"]:
                success_step = step
                break
            if pol.finished:
                break
        if pol._phases is not None and prev_idx < len(pol._phases):
            visits.append((pol._phases[prev_idx].name, prev_t, "running"))
        ok = success_step is not None or bool(env.is_success()["task"])
        return {"seed": seed, "success": ok, "visits": visits,
                "ep_lang": env.get_ep_meta().get("lang", ""),
                "layout": getattr(env, "layout_id", None),
                "style": getattr(env, "style_id", None)}
    except Exception as e:
        return {"seed": seed, "success": False, "visits": visits,
                "error": f"{type(e).__name__}: {e}"}
    finally:
        env.close()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True)
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--seed_list", type=int, nargs="*", default=None)
    ap.add_argument("--max_steps", type=int, default=1700)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    seeds = args.seed_list or list(range(args.seeds))
    fails = collections.Counter()
    n_ok = 0
    for seed in seeds:
        t0 = time.time()
        r = trace_rollout(args.task, seed, args.max_steps)
        n_ok += bool(r["success"])
        tail = [v for v in r["visits"]][-6:]
        stuck = [f"{n}@{t}" for n, t, why in r["visits"] if why == "budget"]
        if not r["success"]:
            # short pause phases (release/settle, budget <= 15, done=False)
            # exhaust their budget BY DESIGN — attribute the failure to the
            # last substantive budget exit instead
            real_stuck = [f"{n}@{t}" for n, t, why in r["visits"]
                          if why == "budget" and t > 15]
            key = (real_stuck[-1].split("@")[0] if real_stuck
                   else (tail[-1][0] if tail else "<none>"))
            if "error" in r:
                key = r["error"].split(":")[0]
            fails[key] += 1
        status = "OK " if r["success"] else "FAIL"
        print(f"[{status}] seed={seed} layout={r.get('layout')} "
              f"style={r.get('style')} ({time.time()-t0:.0f}s) "
              f"budget-exhausted: {stuck or '-'}"
              + (f" error={r['error']}" if "error" in r else ""),
              flush=True)
        if args.verbose:
            for n, t, why in r["visits"]:
                print(f"    {n:<28s} {t:>4d} {why}")
    print(json.dumps({
        "task": args.task, "success": n_ok, "n": len(seeds),
        "rate": round(n_ok / len(seeds), 2),
        "failure_phases": dict(fails.most_common()),
    }))


if __name__ == "__main__":
    main()
