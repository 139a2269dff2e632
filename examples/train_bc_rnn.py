"""Train a BC-RNN-GMM policy programmatically
(counterpart of reference examples/train_bc_rnn.py)."""

import tempfile

import lipvq_tpu.algo  # noqa: F401
from lipvq_tpu.algo.base import algo_factory
from lipvq_tpu.config import config_factory
from lipvq_tpu.utils import obs_utils as ObsUtils
from lipvq_tpu.utils import train_utils as TrainUtils
from lipvq_tpu.utils.file_utils import get_shape_metadata_from_dataset
from lipvq_tpu.utils.test_utils import make_synthetic_dataset


def main():
    dataset_path = make_synthetic_dataset(
        tempfile.mktemp(suffix=".hdf5"), n_demos=8, demo_len=40
    )
    config = config_factory("bc", {
        "train": {
            "data": dataset_path, "batch_size": 16,
            "seq_length": 10, "hdf5_load_next_obs": False,
        },
        "algo": {
            "gmm": {"enabled": True},
            "rnn": {"enabled": True, "hidden_dim": 128, "num_layers": 2,
                    "horizon": 10},
        },
        "observation": {"modalities": {"obs": {"low_dim": [
            "robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
            "object",
        ]}}},
    })
    ObsUtils.initialize_obs_utils_with_config(config)
    shape_meta = get_shape_metadata_from_dataset(
        dataset_path, all_obs_keys=config.all_obs_keys
    )
    model = algo_factory(
        "bc", config, obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )
    train_ds, _ = TrainUtils.load_data_for_training(
        config, obs_keys=shape_meta["all_obs_keys"]
    )
    loader, _, _ = TrainUtils.make_loaders(config, train_ds, None)
    for epoch in range(1, 4):
        log = TrainUtils.run_epoch(model, loader, epoch, num_steps=5)
        print(f"epoch {epoch}: loss={log['Loss']:.4f}")

    obs = {k: train_ds[0]["obs"][k][None] for k in shape_meta["all_obs_keys"]}
    action = model.get_action(obs)
    print("rollout action:", action.shape)


if __name__ == "__main__":
    main()
