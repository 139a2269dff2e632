"""Dataset download entry point.

Counterpart of reference scripts/download_datasets.py /
robocasa download_kitchen_assets.py: resolves dataset registry entries to
their expected local paths and (when network egress is available) fetches
them. This build environment is hermetic (zero egress), so the script
verifies/prints the expected layout and errors informatively on fetch.
"""

from __future__ import annotations

import argparse
import os

from lipvq_tpu.robocasa.dataset_registry import (
    ALL_TASK_DATASETS,
    get_ds_path,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tasks", type=str, nargs="*",
                        default=list(ALL_TASK_DATASETS))
    parser.add_argument("--ds_type", type=str, default="human_im")
    parser.add_argument("--download_dir", type=str, default=None)
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()

    missing = []
    for task in args.tasks:
        path = get_ds_path(task, args.ds_type, base_path=args.download_dir)
        status = "present" if os.path.exists(path) else "missing"
        if status == "missing":
            missing.append(task)
        print(f"{task:28s} {status:8s} {path}")
    if missing and not args.dry_run:
        print(
            f"\n{len(missing)} datasets missing. Download them with the "
            "robocasa release tooling (network access required) and place "
            "them at the paths above, or set ROBOCASA_DATASET_BASE."
        )


if __name__ == "__main__":
    main()
