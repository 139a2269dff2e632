"""Closed-loop convergence on the first-party MuJoCo kitchen.

End-to-end story: the scripted expert collects OpenDrawer
demonstrations, ICL+LipVQ trains on them through the real train()
driver with periodic closed-loop rollouts back in the kitchen env, and
the success rate climbs from zero.

    python examples/kitchen_convergence_demo.py [--n_demos 24]
        [--epochs 12] [--out /tmp/kitchen_conv]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_demos", type=int, default=24)
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--out", type=str, default="/tmp/kitchen_conv")
    parser.add_argument("--task", type=str, default="OpenDrawer")
    parser.add_argument("--layout", type=int, default=None,
                        help="fix the kitchen layout for an easier, "
                        "faster-converging demo")
    args = parser.parse_args()

    from lipvq_tpu.config import config_factory
    from lipvq_tpu.scripts.collect_kitchen_suite import collect_task
    from lipvq_tpu.scripts.train import train
    from lipvq_tpu.utils.test_utils import icl_test_config_overrides

    data = f"{args.out}_demos.hdf5"
    t0 = time.time()
    stats = collect_task(args.task, data, n_demos=args.n_demos,
                         max_steps=300, seed=11,
                         layout_ids=args.layout, style_ids=0
                         if args.layout is not None else None)
    print(f"collected {stats['demos']} demos in {time.time() - t0:.0f}s "
          f"({stats['attempts']} attempts)")

    d = icl_test_config_overrides()
    d["train"].update({"data": data, "num_epochs": args.epochs,
                       "batch_size": 64, "output_dir": args.out})
    d["experiment"].update({
        "epoch_every_n_steps": 200,
        "rollout": {"enabled": True, "n": 3, "horizon": 250,
                    "rate": max(args.epochs // 6, 1)},
        "save": {"enabled": True, "every_n_epochs": args.epochs},
        "validate": False,
    })
    d["algo"]["transformer"].update({"embed_dim": 128, "num_layers": 3,
                                     "num_heads": 4})
    d["algo"]["optim_params"] = {"policy": {"learning_rate": {
        "initial": 1e-3, "scheduler_type": "none"}}}
    # the smoke-test override uses a 32-code debug codebook — far too
    # coarse for manipulation (obs quantization blurs the
    # approach/grasp/pull phase distinctions); use the paper scale
    d["algo"]["vq"] = {"num_codes": 512}
    # mobile-base tasks need the base proprio: the pull-phase arm/base
    # switch keys on base-to-eef retraction
    d["observation"]["modalities"]["obs"]["low_dim"] = [
        "robot0_base_pos", "robot0_base_quat", "robot0_eef_pos",
        "robot0_eef_quat", "robot0_gripper_qpos",
        "robot0_base_to_eef_pos", "object", "lang_emb",
    ]
    cfg = config_factory("icl", d)
    t0 = time.time()
    train(cfg)
    print(f"train + rollouts in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
