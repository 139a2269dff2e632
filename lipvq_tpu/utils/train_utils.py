"""Training-loop utilities.

Counterpart of reference train_utils.py:
- ``dataset_factory`` / ``load_data_for_training`` (reference :94,164)
- ``run_epoch`` (reference :1238): fixed num_steps per epoch, cycling the
  loader on exhaustion, per-phase wall-clock timers emitted as
  ``Time_*`` minutes (reference :1279-1328)
- checkpoint policy helpers (reference :1112-1235)
"""

from __future__ import annotations

import os
import time
from collections import defaultdict

import numpy as np

from lipvq_tpu.data.dataset import SequenceDataset
from lipvq_tpu.data.loaders import CyclingIterator, DataLoader


def dataset_factory(config, obs_keys, filter_by_attribute=None,
                    dataset_path=None, lang_encoder=None) -> SequenceDataset:
    """Build a SequenceDataset from config (reference train_utils.py:164-218)."""
    if dataset_path is None:
        dataset_path = config.train.data
    return SequenceDataset(
        hdf5_path=dataset_path,
        obs_keys=obs_keys,
        dataset_keys=tuple(config.train.dataset_keys),
        action_keys=tuple(config.train.action_keys),
        action_config=config.train.action_config.to_dict()
        if hasattr(config.train.action_config, "to_dict")
        else dict(config.train.action_config),
        frame_stack=config.train.frame_stack,
        seq_length=config.train.seq_length,
        pad_frame_stack=config.train.pad_frame_stack,
        pad_seq_length=config.train.pad_seq_length,
        goal_mode=config.train.goal_mode,
        # "device" is a loader-level mode (HBM-resident corpus, see
        # DeviceCachedLoader); the dataset itself caches low_dim so the
        # one-time materialization pass reads RAM, not HDF5
        hdf5_cache_mode=("low_dim"
                         if config.train.hdf5_cache_mode == "device"
                         else config.train.hdf5_cache_mode),
        hdf5_use_swmr=config.train.hdf5_use_swmr,
        filter_by_attribute=filter_by_attribute,
        load_next_obs=config.train.hdf5_load_next_obs,
        lang_encoder=lang_encoder,
    )


def load_data_for_training(config, obs_keys, lang_encoder=None):
    """(train_dataset, valid_dataset) (reference train_utils.py:94-161).

    ``config.train.data`` may be a single path or a list of dataset specs
    ({"path": ..., "weight"?: ..., "filter_key"?: ...}) — lists build a
    MetaDataset with shared normalization stats (reference MetaDataset
    flow, dataset.py:1063+).
    """
    train_filter = config.train.hdf5_filter_key
    valid_filter = config.train.hdf5_validation_filter_key
    data = config.train.data

    if isinstance(data, (list, tuple)):
        from lipvq_tpu.data.dataset import MetaDataset

        datasets, weights = [], []
        for spec in data:
            if isinstance(spec, str):
                spec = {"path": spec}
            cache = config.train.hdf5_cache_mode
            if cache == "all" and len(data) > 1:
                cache = "low_dim"  # MetaDataset forbids "all" (ref quirk)
            ds = dataset_factory(
                config, obs_keys,
                filter_by_attribute=spec.get("filter_key", train_filter),
                dataset_path=spec["path"], lang_encoder=lang_encoder,
            )
            datasets.append(ds)
            weights.append(float(spec.get("weight", 1.0)))
        train_ds = MetaDataset(
            datasets, ds_weights=weights,
            normalize_weights_by_ds_size=bool(
                config.train.get("normalize_weights_by_ds_size", False)
            ),
        )
        return train_ds, None

    train_ds = dataset_factory(
        config, obs_keys, filter_by_attribute=train_filter,
        lang_encoder=lang_encoder,
    )
    valid_ds = None
    if config.experiment.validate:
        valid_ds = dataset_factory(
            config, obs_keys, filter_by_attribute=valid_filter,
            lang_encoder=lang_encoder,
        )
        valid_ds.set_action_normalization_stats(
            train_ds.get_action_normalization_stats()
        )
    return train_ds, valid_ds


def run_epoch(model, data_loader, epoch: int, validate: bool = False,
              num_steps: int | None = None, obs_normalization_stats=None,
              sync_every: int = 25):
    """One epoch of fixed gradient steps (reference train_utils.py:1238-1352).

    Returns step_log with averaged losses + ``Time_*`` phase minutes.

    ``sync_every`` bounds the number of dispatched-but-unfinished steps:
    under the axon relay, jit dispatch AND ``block_until_ready`` return
    at enqueue, so a full epoch of steps (300) can be enqueued with zero
    completions — observed to deadlock the relay session (the stream
    goes silent and every later fetch blocks forever; reproduced 3/3 at
    epoch 1 of the kitchen suite, while 30-deep enqueue profiles run
    fine). A one-scalar fetch every ``sync_every`` steps forces the
    device stream to drain through that step (each step's metrics depend
    on the whole step), keeping the relay queue bounded at the cost of
    one round trip per ``sync_every`` steps.
    """
    it = data_loader if isinstance(data_loader, CyclingIterator) else CyclingIterator(data_loader)
    inner = data_loader.loader if isinstance(data_loader, CyclingIterator) else data_loader
    if num_steps is None:
        num_steps = len(inner)
    # device-cached loaders yield already-preprocessed device batches;
    # re-processing would np.asarray them back onto the host
    preprocessed = getattr(inner, "preprocessed", False)

    timing = {"Data_Loading": 0.0, "Process_Batch": 0.0, "Train_Batch": 0.0,
              "Log_Info": 0.0}

    # Metrics stay ON DEVICE during the epoch: fetching the loss
    # scalars per step costs a device round-trip each (over a dev
    # tunnel that alone was ~8x the compute time). All step infos are
    # stacked and fetched in ONE transfer after the last dispatch.
    raw_infos = []
    for _ in range(num_steps):
        t0 = time.time()
        batch = next(it)
        timing["Data_Loading"] += time.time() - t0

        t0 = time.time()
        input_batch = (batch if preprocessed
                       else model.process_batch_for_training(batch))
        timing["Process_Batch"] += time.time() - t0

        t0 = time.time()
        info = model.train_on_batch(input_batch, epoch, validate=validate)
        raw_infos.append(info)
        if sync_every and len(raw_infos) % sync_every == 0:
            import jax

            # drain on the first DEVICE leaf: leaves[0] can be a host
            # scalar while later leaves are device arrays, in which case
            # testing only leaves[0] would skip the barrier entirely
            dev_leaf = next(
                (x for x in jax.tree.leaves(info)
                 if hasattr(x, "block_until_ready")), None)
            if dev_leaf is not None:
                np.asarray(dev_leaf)  # value fetch = real drain barrier
        timing["Train_Batch"] += time.time() - t0

    t0 = time.time()
    import jax

    # one stacked fetch per metric leaf (a handful of transfers per
    # EPOCH instead of one sync per step — measured 8x on the epoch
    # wall time over the device tunnel)
    stacked = jax.tree.map(lambda *xs: np.asarray(jnp_stack(xs)), *raw_infos)
    step_log_all = defaultdict(list)
    for i in range(num_steps):
        step_info = jax.tree.map(lambda x, _i=i: x[_i], stacked)
        for k, v in model.log_info(step_info).items():
            step_log_all[k].append(v)
    timing["Log_Info"] += time.time() - t0

    out = {k: float(np.mean(v)) for k, v in step_log_all.items()}
    for k, v in timing.items():
        out[f"Time_{k}"] = v / 60.0
    return out


def jnp_stack(xs):
    import jax.numpy as jnp

    if hasattr(xs[0], "shape") or isinstance(xs[0], (int, float)):
        return jnp.stack([jnp.asarray(x) for x in xs])
    return np.asarray(xs)


def get_exp_dir(config, auto_remove_exp_dir: bool = False):
    """Create output dir tree: log/ models/ videos/
    (reference train_utils.py:32-90)."""
    base = os.path.expanduser(config.train.output_dir)
    t_str = time.strftime("%Y%m%d%H%M%S")
    exp_dir = os.path.join(base, config.experiment.name, t_str)
    log_dir = os.path.join(exp_dir, "logs")
    ckpt_dir = os.path.join(exp_dir, "models")
    video_dir = os.path.join(exp_dir, "videos")
    for d in (log_dir, ckpt_dir, video_dir):
        os.makedirs(d, exist_ok=True)
    return log_dir, ckpt_dir, video_dir


def should_save_from_rollout_logs(rollout_logs, best_return, best_success_rate,
                                  epoch_ckpt_name, save_on_best_rollout_return,
                                  save_on_best_rollout_success_rate):
    """Checkpoint decision from rollout stats (reference train_utils.py:1112)."""
    should_save = False
    for env_name, logs in rollout_logs.items():
        if logs.get("Return", -np.inf) > best_return.get(env_name, -np.inf):
            best_return[env_name] = logs["Return"]
            if save_on_best_rollout_return:
                epoch_ckpt_name += f"_{env_name}_return_{logs['Return']}"
                should_save = True
        sr = logs.get("Success_Rate", -1.0)
        if sr > best_success_rate.get(env_name, -1.0):
            best_success_rate[env_name] = sr
            if save_on_best_rollout_success_rate:
                epoch_ckpt_name += f"_{env_name}_success_{sr}"
                should_save = True
    return should_save, epoch_ckpt_name, best_return, best_success_rate


def make_loaders(config, train_ds, valid_ds, model=None):
    from lipvq_tpu.data.loaders import (
        DeviceCachedLoader,
        MultiprocessLoader,
        PrefetchLoader,
    )

    sampler = None
    if hasattr(train_ds, "get_dataset_sampler"):
        group_bs = (
            config.train.batch_size
            if config.train.get("group_task_batches", False) else None
        )
        sampler = train_ds.get_dataset_sampler(
            seed=config.train.seed, batch_size=group_bs
        )
    if config.train.hdf5_cache_mode == "device" and model is not None:
        if config.train.get("group_task_batches", False):
            raise ValueError(
                "hdf5_cache_mode='device' draws i.i.d. weighted indices "
                "and cannot honor group_task_batches; use 'low_dim'"
            )
        train_loader = DeviceCachedLoader(
            train_ds, batch_size=config.train.batch_size, model=model,
            seed=config.train.seed, sampler=sampler,
        )
        valid_loader = None
        if valid_ds is not None:
            valid_loader = DataLoader(
                valid_ds, batch_size=config.train.batch_size, shuffle=True,
                seed=config.train.seed + 1,
            )
        context_loader = DataLoader(
            train_ds, batch_size=1, shuffle=True, seed=config.train.seed + 2,
            drop_last=False,
        )
        return train_loader, valid_loader, context_loader
    n_workers = int(config.train.num_data_workers or 0)
    if n_workers > 1:
        # worker PROCESSES like the reference's torch
        # DataLoader(num_workers=5) at the image protocol
        # (config_gen_utils.py:232-238); 0/1 keeps the GIL-thread path
        train_loader = MultiprocessLoader(
            train_ds, batch_size=config.train.batch_size, shuffle=True,
            seed=config.train.seed, sampler=sampler, num_workers=n_workers,
        )
    else:
        train_loader = DataLoader(
            train_ds, batch_size=config.train.batch_size, shuffle=True,
            seed=config.train.seed, sampler=sampler,
        )
        if n_workers:
            train_loader = PrefetchLoader(train_loader, prefetch=2)
    valid_loader = None
    if valid_ds is not None:
        valid_loader = DataLoader(
            valid_ds, batch_size=config.train.batch_size, shuffle=True,
            seed=config.train.seed + 1,
        )
    # rollout context loader: batch_size 1 over the training set
    # (reference train.py:217-224 — eval conditions on one training demo)
    context_loader = DataLoader(
        train_ds, batch_size=1, shuffle=True, seed=config.train.seed + 2,
        drop_last=False,
    )
    return train_loader, valid_loader, context_loader
