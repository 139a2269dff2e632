"""Minimal train loop using the framework's building blocks directly
(counterpart of reference examples/simple_train_loop.py).

Creates a synthetic robomimic-format dataset, builds the flagship ICL +
LipVQ-VAE model, and runs a few epochs without the full train() driver.
"""

import tempfile

import lipvq_tpu.algo  # noqa: F401 — register algorithms
from lipvq_tpu.algo.base import algo_factory
from lipvq_tpu.config import config_factory
from lipvq_tpu.utils import obs_utils as ObsUtils
from lipvq_tpu.utils import train_utils as TrainUtils
from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset
from lipvq_tpu.utils.test_utils import (
    icl_test_config_overrides,
    make_synthetic_dataset,
)


def main():
    dataset_path = make_synthetic_dataset(
        tempfile.mktemp(suffix=".hdf5"), n_demos=8, demo_len=40
    )

    overrides = icl_test_config_overrides()
    overrides["train"]["data"] = dataset_path
    config = config_factory("icl", overrides)

    ObsUtils.initialize_obs_utils_with_config(config)
    shape_meta = get_shape_metadata_from_dataset(
        dataset_path, all_obs_keys=config.all_obs_keys
    )
    model = algo_factory(
        "icl", config,
        obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )

    train_ds, _ = TrainUtils.load_data_for_training(
        config, obs_keys=shape_meta["all_obs_keys"]
    )
    loader, _, _ = TrainUtils.make_loaders(config, train_ds, None)

    for epoch in range(1, 4):
        log = TrainUtils.run_epoch(model, loader, epoch, num_steps=5)
        print(f"epoch {epoch}: loss={log['Loss']:.4f} "
              f"vq={log.get('VQ_Loss', 0):.4f}")


if __name__ == "__main__":
    main()
