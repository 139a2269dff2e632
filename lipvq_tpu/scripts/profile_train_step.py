"""Train-step performance profile: step time, FLOPs, MFU.

VERDICT r2 weak #2: the 20.1% template-scale MFU figure was produced
without any profile, and the image-protocol step (68 ms) had no MFU
number at all. This tool measures both under XLA's own cost analysis:

- ``--mode lowdim``: the reference low-dim template scale (GPT 6L/512d/
  8h over 3x10 tokens, LipVQ 1024 codes) swept over batch sizes — the
  scaling curve is the roofline argument: if MFU climbs with batch, the
  batch-100 step is launch/HBM-latency bound (3,000 token rows are tiny
  for a 128x128 MXU), not compute-bound.
- ``--mode image``: the robocasa image protocol (batch 16, two 128x128
  camera streams through FiLM ResNet18 + 116x116 crop, 10 frames) —
  first-ever MFU figure for this step.
- ``--trace DIR``: additionally dump a jax.profiler trace for the
  default batch size.

FLOPs come from the compiled step's ``cost_analysis()['flops']``
(the same estimator the round-2 figure used); peak is v5e bf16
(197 TFLOP/s marketing, 39.6e12 usable per-core figure used in r2 —
we report against both).

    python -m lipvq_tpu.scripts.profile_train_step --mode lowdim
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # chip peak (marketing bf16)
V5E_R2_PEAK = 39.6e12  # the round-2 comparison figure (per-core fp32-ish)


def make_lowdim_model(batch_size, compute_dtype="float32",
                      activation_dtype="float32", remat=False):
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.config import config_factory

    obs_key_shapes = {
        "robot0_eef_pos": [3],
        "robot0_eef_quat": [4],
        "robot0_gripper_qpos": [2],
        "object": [14],
        "lang_emb": [768],
    }
    cfg = config_factory("icl", {
        "train": {"batch_size": batch_size, "max_grad_norm": 100.0},
        "algo": {
            "gmm": {"enabled": True},
            "transformer": {
                "enabled": True, "supervise_all_steps": True,
                "pred_future_acs": True, "causal": False,
                "embed_dim": 512, "num_layers": 6, "num_heads": 8,
                "vq_vae_enabled": True, "ln_act_enabled": False,
                "compute_dtype": compute_dtype,
                "activation_dtype": activation_dtype,
                "remat": remat,
            },
            "vq": {"num_codes": 1024},
        },
    })
    with cfg.unlocked():
        cfg.observation.modalities.obs.low_dim = list(obs_key_shapes)
    model = algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)
    return model, obs_key_shapes


def make_image_model(batch_size=16, img=128, compute_dtype="float32",
                     activation_dtype="float32", remat=False):
    import lipvq_tpu.algo  # noqa: F401
    from lipvq_tpu.algo.base import algo_factory
    from lipvq_tpu.config import config_factory
    from lipvq_tpu.utils import obs_utils as ObsUtils

    obs_key_shapes = {
        "robot0_eef_pos": [3],
        "robot0_eef_quat": [4],
        "robot0_gripper_qpos": [2],
        "lang_emb": [768],
        "robot0_agentview_left_image": [img, img, 3],
        "robot0_eye_in_hand_image": [img, img, 3],
    }
    cfg = config_factory("icl", {
        "train": {"batch_size": batch_size},
        "algo": {
            "gmm": {"enabled": True},
            "transformer": {
                "enabled": True, "supervise_all_steps": True,
                "pred_future_acs": True, "causal": False,
                "embed_dim": 512, "num_layers": 6, "num_heads": 8,
                "vq_vae_enabled": True, "ln_act_enabled": False,
                "compute_dtype": compute_dtype,
                "activation_dtype": activation_dtype,
                "remat": remat,
            },
            "vq": {"num_codes": 1024},
        },
        "observation": {
            "modalities": {"obs": {
                "low_dim": ["robot0_eef_pos", "robot0_eef_quat",
                            "robot0_gripper_qpos", "lang_emb"],
                "rgb": ["robot0_agentview_left_image",
                        "robot0_eye_in_hand_image"],
            }},
            "encoder": {"rgb": {
                "core_class": "VisualCoreLanguageConditioned",
                "core_kwargs": {"feature_dimension": 64,
                                "pool_kwargs": {"num_kp": 32}},
                "obs_randomizer_class": "CropRandomizer",
                "obs_randomizer_kwargs": {"crop_height": 116,
                                          "crop_width": 116,
                                          "num_crops": 1},
            }},
        },
    })
    ObsUtils.initialize_obs_utils_with_config(cfg)
    model = algo_factory("icl", cfg, obs_key_shapes, ac_dim=12)
    return model, obs_key_shapes


def device_batch(model, obs_key_shapes, batch_size):
    import jax

    rng = np.random.default_rng(0)
    t = model.context_length
    obs = {}
    for k, s in obs_key_shapes.items():
        if len(s) == 3:  # image, already processed float CHW-agnostic HWC
            obs[k] = rng.random((batch_size, t, *s), dtype=np.float32)
        else:
            obs[k] = rng.standard_normal((batch_size, t, *s)).astype(
                np.float32
            )
    batch = {
        "obs": obs,
        "actions": (rng.standard_normal((batch_size, t, 12)) * 0.3).astype(
            np.float32
        ),
        "goal_obs": None,
    }
    return jax.device_put(batch)


def measure(model, batch, iters=30, reps=3):
    """Step time via k-iteration enqueue + single fetch (tunnel-safe)."""
    import jax

    # warm + compile
    info = model.train_on_batch(batch, epoch=1)
    jax.block_until_ready(info["losses"]["action_loss"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            info = model.train_on_batch(batch, epoch=1)
        float(info["losses"]["action_loss"])  # one fetch drains the queue
        best = min(best, (time.time() - t0) / iters)
    return best


def step_flops(model, batch):
    """-> (flops, bytes_accessed) from XLA cost analysis."""
    try:
        lowered = model._jit_train_step.lower(model.state, batch)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return (float(cost.get("flops", float("nan"))),
                float(cost.get("bytes accessed", float("nan"))))
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"cost_analysis failed: {e}", file=sys.stderr)
        return float("nan"), float("nan")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("lowdim", "image"), default="lowdim")
    ap.add_argument("--batches", type=int, nargs="*", default=None)
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="float32",
                    help="backbone compute dtype (the round-2 bench and "
                         "the shipped template use bfloat16)")
    ap.add_argument("--activations", choices=("float32", "bfloat16"),
                    default="float32",
                    help="backbone residual-stream dtype: bfloat16 halves "
                         "saved-activation HBM traffic (the round-3 "
                         "roofline lever)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize transformer blocks: trade spare "
                         "MXU FLOPs (~25%% MFU) for saved-activation HBM "
                         "traffic (the binding constraint at saturation)")
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args(argv)

    import jax

    rows = []
    batches = args.batches or ([100, 200, 400, 800, 1600]
                               if args.mode == "lowdim" else [16, 32, 64])
    for b in batches:
        if args.mode == "lowdim":
            model, shapes = make_lowdim_model(
                b, compute_dtype=args.dtype,
                activation_dtype=args.activations, remat=args.remat)
        else:
            model, shapes = make_image_model(
                b, compute_dtype=args.dtype,
                activation_dtype=args.activations, remat=args.remat)
        batch = device_batch(model, shapes, b)
        flops, nbytes = step_flops(model, batch)
        dt = measure(model, batch, iters=args.iters)
        tflops = flops / dt / 1e12 if np.isfinite(flops) else float("nan")
        row = {
            "mode": args.mode,
            "dtype": args.dtype,
            "activations": args.activations,
            "remat": bool(args.remat),
            "batch": b,
            "step_ms": round(dt * 1e3, 2),
            "samples_per_s": round(b / dt, 1),
            "step_gflops": round(flops / 1e9, 1),
            "achieved_tflops": round(tflops, 2),
            "mfu_vs_v5e_bf16_peak": round(100 * tflops * 1e12 / V5E_BF16_PEAK, 1),
            "mfu_vs_r2_figure": round(100 * tflops * 1e12 / V5E_R2_PEAK, 1),
            # HBM roofline: v5e ~819 GB/s. When hbm_floor_ms ~= step_ms
            # the step is bandwidth-bound and a faster MXU cannot help.
            "step_gbytes": round(nbytes / 1e9, 2),
            "hbm_floor_ms": round(nbytes / 819e9 * 1e3, 2),
            "hbm_bw_util": round(100 * nbytes / 819e9 / dt, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.trace and b == batches[0]:
            with jax.profiler.trace(args.trace):
                for _ in range(5):
                    info = model.train_on_batch(batch, epoch=1)
                jax.block_until_ready(info["losses"]["action_loss"])
            print(f"trace written to {args.trace}", file=sys.stderr)
    print(json.dumps({"profile": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
