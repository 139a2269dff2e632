"""Demonstration collection.

Counterpart of reference robocasa/scripts/collect_demos.py (528 LoC,
keyboard/SpaceMouse teleop). Device teleop requires robosuite's input
devices; this collector additionally supports a **scripted policy** mode
that works headless (and generates valid training corpora from the
synthetic env — used by the examples and tests). Output is a
robomimic-format HDF5 (SURVEY.md A.1) consumable by SequenceDataset.

    python -m lipvq_tpu.scripts.collect_demos --env SyntheticKitchen \
        --n_demos 20 --output demos.hdf5
"""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np

from lipvq_tpu.robocasa.env_utils import create_env


def scripted_policy(obs: dict, rng) -> np.ndarray:
    """Go-to-goal controller for the synthetic env with exploration noise."""
    pos = obs["robot0_eef_pos"]
    target = obs["object"][:3]
    a = np.zeros(12, np.float32)
    a[:3] = np.clip((target - pos) / 0.05, -1, 1)
    a[:3] += rng.normal(0, 0.1, 3)
    return np.clip(a, -1, 1)


def collect_demo(env, policy_fn, max_steps: int, rng, policy_factory=None,
                 action_noise: float = 0.0, dwell_prob: float = 0.0,
                 dwell_max: int = 8):
    """``action_noise`` > 0 enables DART-style noise injection: the
    recorded label is the expert's clean action while the EXECUTED
    action is perturbed, so the corpus covers the off-path states a BC
    policy will drift into (deterministic scripted experts otherwise
    produce zero recovery coverage).

    ``dwell_prob`` > 0 additionally injects random DWELLS: the robot
    HOLDS position for 3..dwell_max steps while the recorded label stays
    the expert's clean progress action. Scripted experts progress quasi-
    deterministically in time, so a BC policy can learn TIME-based phase
    progression and replay later-phase motions without their
    preconditions holding (the OpenSingleDoor 0.0 failure: the swing
    replays without the handle hooked — BASELINE.md round-3/4 probes).
    Dwells decorrelate trajectory time from state: the corpus contains
    (unprogressed state -> progress action) pairs at many timestamps,
    forcing state-conditioned progression. The expert's phase machine is
    NOT advanced during a dwell (its per-phase budgets would burn while
    nothing moves)."""
    obs = env.reset()
    # per-episode experts (kitchen scripted policies) rebuild their
    # waypoint phases from the fresh episode's fixtures
    if policy_factory is not None:
        expert = policy_factory(env)

        def policy_fn(o, _rng):
            return expert.get_action(o)

    traj = {"obs": [], "actions": [], "rewards": [], "dones": [],
            "states": [], "lang": getattr(env, "ep_lang_str", None)}
    dwell_left = 0
    dwell_label = None
    for t in range(max_steps):
        if dwell_left > 0:
            # the env is quasi-static under a hold, so the clean action
            # captured at dwell entry remains a correct label
            a = dwell_label
            dwell_left -= 1
            in_dwell = True
        else:
            a = np.asarray(policy_fn(obs, rng), dtype=float)
            in_dwell = dwell_prob > 0.0 and rng.random() < dwell_prob
            if in_dwell:
                dwell_left = int(rng.integers(3, dwell_max + 1)) - 1
                dwell_label = a
        state = env.get_state()
        traj["obs"].append(obs)
        traj["states"].append(state)
        exec_a = a
        if in_dwell:
            # hold: zero deltas, discrete channels (grip, base-mode
            # flag) kept crisp so modes don't flip mid-dwell
            exec_a = np.zeros_like(a)
            exec_a[6] = a[6]
            if a.shape[0] > 11:
                exec_a[11] = a[11]
        elif action_noise > 0.0:
            exec_a = np.clip(
                a + rng.normal(0.0, action_noise, size=a.shape), -1.0, 1.0
            )
            # keep the discrete channels crisp (grip sign, base-mode
            # flag): noise there flips modes rather than perturbing
            exec_a[6] = a[6]
            if a.shape[0] > 11:
                exec_a[11] = a[11]
        obs, r, done, info = env.step(exec_a)
        traj["actions"].append(a)
        traj["rewards"].append(r)
        success = info.get("is_success", {}).get("task", False)
        traj["dones"].append(float(done or success))
        if done or success:
            break
        if policy_factory is not None and expert.finished:
            break
    return traj, bool(success)


def write_demos(path: str, env, trajs: list[dict], lang: str | None = None,
                write_next_obs: bool = True):
    """write_next_obs stores obs shifted by one step (last repeated) so
    offline-RL / GL / HBC algorithms (which need next_obs) train directly
    on collected corpora."""
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(env.serialize())
        total = 0
        for i, traj in enumerate(trajs):
            g = data.create_group(f"demo_{i}")
            n = len(traj["actions"])
            g.create_dataset("actions", data=np.stack(traj["actions"]))
            g.create_dataset("rewards", data=np.asarray(traj["rewards"],
                                                        np.float32))
            g.create_dataset("dones", data=np.asarray(traj["dones"],
                                                      np.float32))
            states = traj["states"]
            if states and isinstance(states[0], dict):
                if "states" in states[0]:
                    # kitchen-style {states, ep_meta, model}: store the
                    # flat sim state; the model xml (identical within a
                    # demo) goes to attrs for exact reset_to replay
                    flat = np.stack([np.asarray(s["states"]) for s in states])
                    if states[0].get("model"):
                        g.attrs["model_file"] = states[0]["model"]
                else:
                    flat = np.stack([
                        np.concatenate([np.ravel(v) for v in s.values()])
                        for s in states
                    ])
            else:
                flat = np.stack(states) if states[0] is not None else (
                    np.zeros((n, 1), np.float32)
                )
            g.create_dataset("states", data=flat.astype(np.float32))
            og = g.create_group("obs")
            keys = traj["obs"][0].keys()
            for k in keys:
                arr = np.stack([o[k] for o in traj["obs"]])
                og.create_dataset(k, data=arr)
            if write_next_obs:
                nog = g.create_group("next_obs")
                for k in keys:
                    arr = np.stack([o[k] for o in traj["obs"]])
                    nxt = np.concatenate([arr[1:], arr[-1:]], axis=0)
                    nog.create_dataset(k, data=nxt)
            g.attrs["num_samples"] = n
            ep_meta = dict(traj.get("ep_meta") or {})
            ep_meta["lang"] = (
                traj.get("lang") or lang
                or getattr(env, "ep_lang_str", None) or "demo"
            )
            g.attrs["ep_meta"] = json.dumps(ep_meta)
            total += n
        data.attrs["total"] = total
    return path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="SyntheticKitchen")
    parser.add_argument("--n_demos", type=int, default=20)
    parser.add_argument("--max_steps", type=int, default=200)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--device", type=str, default="scripted",
                        choices=["scripted", "keyboard", "spacemouse"])
    parser.add_argument("--only_success", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    env = create_env(args.env, seed=args.seed)

    if args.device != "scripted":
        # terminal teleop (reference collect_demos.py:481-491 uses
        # robosuite Keyboard/SpaceMouse; ours reads raw stdin)
        from lipvq_tpu.robocasa.sim.devices import make_device

        device = make_device(args.device)
        trajs, n_success = [], 0
        print("teleop: wasd/rf move arm, space grip, b base mode, "
              "q end episode, . mark success")
        while len(trajs) < args.n_demos:
            obs = env.reset()
            print(f"episode {len(trajs)}: {env.ep_lang_str}")
            device.start_control()
            traj = {"obs": [], "actions": [], "rewards": [], "dones": [],
                    "states": [], "lang": getattr(env, "ep_lang_str", None)}
            try:
                for t in range(args.max_steps):
                    a, ctrl = device.get_action()
                    traj["obs"].append(obs)
                    traj["states"].append(env.get_state())
                    obs, r, done, info = env.step(a)
                    traj["actions"].append(a)
                    traj["rewards"].append(r)
                    success = (
                        info.get("is_success", {}).get("task", False)
                        or ctrl["success"]
                    )
                    traj["dones"].append(float(done or success))
                    if done or success or ctrl["done"]:
                        break
            finally:
                device.stop_control()
            if hasattr(env, "get_ep_meta"):
                traj["ep_meta"] = env.get_ep_meta()
            if args.only_success and not success:
                continue
            trajs.append(traj)
            n_success += int(success)
        write_demos(args.output, env, trajs)
        print(f"wrote {len(trajs)} demos ({n_success} successful) to "
              f"{args.output}")
        return

    rng = np.random.default_rng(args.seed)

    # kitchen tasks use the privileged scripted experts; the synthetic
    # env keeps its go-to-goal controller
    policy_factory = None
    try:
        from lipvq_tpu.robocasa.sim.scripted import (
            TASK_POLICIES,
            make_scripted_policy,
        )

        if args.env in TASK_POLICIES:
            def policy_factory(e):
                return make_scripted_policy(args.env, e)
    except ImportError:
        pass

    trajs, n_success, attempts = [], 0, 0
    while len(trajs) < args.n_demos and attempts < args.n_demos * 8:
        attempts += 1
        traj, success = collect_demo(
            env, scripted_policy, args.max_steps, rng,
            policy_factory=policy_factory,
        )
        if hasattr(env, "get_ep_meta"):
            traj["ep_meta"] = env.get_ep_meta()
        if args.only_success and not success:
            continue
        trajs.append(traj)
        n_success += int(success)
    write_demos(args.output, env, trajs)
    print(f"wrote {len(trajs)} demos ({n_success} successful) to "
          f"{args.output}")


if __name__ == "__main__":
    main()
