"""Algorithm base class + registry + optimizer factories.

Counterpart of reference algo/algo.py:
- ``register_algo_factory_func`` / ``algo_factory`` (reference algo.py:34-89)
- ``Algo`` lifecycle API: process_batch_for_training / train_on_batch /
  log_info / get_action / serialize / deserialize (reference algo.py:92-350)

TPU-native train-state design: parameters, optimizer state, mutable
collections (batch_stats / bin_stats / spectral_stats) and PRNG key live in
one pytree ``TrainState``; each algorithm builds a single jitted train step
over it. The reference's two-optimizer scheme (policy Adam/AdamW + separate
VQ AdamW, reference icl.py:885-889) becomes an ``optax.multi_transform``
over disjoint param labels — combined with the stop-gradient boundary on
the tokenizer output this reproduces the reference's update semantics in
one fused step (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

ALGO_REGISTRY: dict[str, Callable] = {}


def register_algo_factory_func(algo_name: str):
    """Decorator registering ``algo_config -> (algo_cls, kwargs)`` resolvers
    (reference algo.py:34-56)."""

    def decorator(fn):
        ALGO_REGISTRY[algo_name] = fn
        return fn

    return decorator


def algo_name_to_factory_func(algo_name: str):
    return ALGO_REGISTRY[algo_name]


def algo_factory(algo_name: str, config, obs_key_shapes: dict, ac_dim: int,
                 device=None):
    """Instantiate an algorithm (reference algo.py:57-89)."""
    if algo_name not in ALGO_REGISTRY:
        raise KeyError(
            f"Unknown algo {algo_name!r}; registered: {sorted(ALGO_REGISTRY)}"
        )
    factory = ALGO_REGISTRY[algo_name]
    algo_cls, algo_kwargs = factory(config.algo)
    return algo_cls(
        algo_config=config.algo,
        obs_config=config.observation,
        global_config=config,
        obs_key_shapes=obs_key_shapes,
        ac_dim=ac_dim,
        **algo_kwargs,
    )


# ---------------------------------------------------------------------------
# train state
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    extra_vars: Any  # mutable collections: batch_stats/bin_stats/spectral_stats
    rng: jax.Array


# ---------------------------------------------------------------------------
# optimizer / schedule factories (reference torch_utils.py:90-196)
# ---------------------------------------------------------------------------

def lr_schedule_from_config(optim_params, num_training_steps: int | None = None):
    """Build an optax schedule matching the reference's scheduler set.

    Note the reference steps schedulers once per *gradient step* while
    ``multistep`` milestones are epoch numbers — a known quirk reproduced
    here by treating milestones as step counts (reference icl.py:204-227 +
    torch_utils.py:160-170).
    """
    lr = float(optim_params["learning_rate"]["initial"])
    sched_type = optim_params["learning_rate"].get("scheduler_type",
                                                   "constant_with_warmup")
    warmup = int(optim_params["learning_rate"].get("num_warmup_steps", 10000))
    decay_factor = float(optim_params["learning_rate"].get("decay_factor", 0.1))

    if sched_type in (None, "none"):
        return lr
    if sched_type == "constant":
        return lr
    if sched_type == "constant_with_warmup":
        return optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, lr, warmup),
             optax.schedules.constant_schedule(lr)],
            [warmup],
        )
    if sched_type == "linear":
        return optax.schedules.linear_schedule(lr, lr * decay_factor, warmup)
    if sched_type == "multistep":
        milestones = list(optim_params["learning_rate"]["epoch_schedule"])
        assert milestones
        return optax.schedules.piecewise_constant_schedule(
            lr, {int(m): decay_factor for m in milestones}
        )
    if sched_type == "cosine":
        assert num_training_steps is not None
        return optax.schedules.warmup_cosine_decay_schedule(
            0.0, lr, warmup, num_training_steps
        )
    raise ValueError(f"Invalid LR scheduler type: {sched_type}")


def optimizer_from_optim_params(optim_params, max_grad_norm: float | None = None,
                                num_training_steps: int | None = None):
    """adam/adamw with L2 + optional global-norm clip
    (reference torch_utils.py:90-120 + backprop_for_loss:196)."""
    schedule = lr_schedule_from_config(optim_params, num_training_steps)
    wd = float(optim_params["regularization"]["L2"])
    opt_type = optim_params.get("optimizer_type", "adam")
    if opt_type == "adam":
        # torch Adam's weight_decay is L2-into-gradient, not decoupled
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(schedule),
        )
    elif opt_type == "adamw":
        tx = optax.adamw(schedule, weight_decay=wd)
    else:
        raise ValueError(opt_type)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(max_grad_norm)), tx)
    return tx


# ---------------------------------------------------------------------------
# Algo base
# ---------------------------------------------------------------------------

class Algo:
    """Base algorithm lifecycle (reference algo.py:92-350)."""

    def __init__(self, algo_config, obs_config, global_config,
                 obs_key_shapes: dict, ac_dim: int):
        self.algo_config = algo_config
        self.obs_config = obs_config
        self.global_config = global_config
        self.obs_key_shapes = obs_key_shapes
        self.ac_dim = ac_dim
        self.nets = None
        self.state: TrainState | None = None
        self._create_shapes(obs_config.modalities, obs_key_shapes)
        self._create_networks()
        self._create_optimizers()

    def _create_shapes(self, obs_keys, obs_key_shapes):
        """Partition obs keys into obs/goal/subgoal shape dicts
        (reference algo.py:139-174)."""
        self.obs_shapes = {}
        self.goal_shapes = {}
        self.subgoal_shapes = {}
        for k, shape in obs_key_shapes.items():
            obs_group = obs_keys.get("obs", {})
            goal_group = obs_keys.get("goal", {})
            if any(k in v for v in obs_group.values()):
                self.obs_shapes[k] = shape
            if any(k in v for v in goal_group.values()):
                self.goal_shapes[k] = shape

    # -- multi-device execution --------------------------------------------
    mesh = None  # jax.sharding.Mesh when attached; None = single device

    def attach_mesh(self, mesh) -> None:
        """Enable data-parallel execution over a ``jax.sharding.Mesh``:
        replicate the train state across devices and shard every training
        batch on its leading (batch) axis. The jitted train steps are
        unchanged — GSPMD inserts the gradient / EMA-stat psums
        (SURVEY.md §2.5, §5.8). This is the product multi-chip path: both
        ``scripts/train.py`` (``train.num_devices``) and the driver's
        ``dryrun_multichip`` go through here."""
        from lipvq_tpu.parallel.mesh import replicate

        self.mesh = mesh
        if self.state is not None:
            self.state = replicate(mesh, self.state)
        # composite algos (HBC/IRIS/GL wrappers) hold sub-algos with their
        # own TrainState — propagate
        for attr in ("planner", "actor", "value_bcq", "_raw_planner"):
            sub = getattr(self, attr, None)
            if isinstance(sub, Algo):
                sub.attach_mesh(mesh)

    # device inference pinning: None = default device (the TPU)
    _infer_device = None

    def set_inference_device(self, device) -> None:
        """Pin ``get_action`` to a specific device (e.g. the host CPU).

        Closed-loop eval dispatches one tiny forward per env macro-step;
        over the device tunnel each dispatch pays per-array transfer
        round-trips that dwarf the compute (measured 1.15 s/step vs
        23 ms of MuJoCo stepping on the 8-task suite screen). Committing
        the state + inputs to ``jax.devices("cpu")[0]`` keeps the jitted
        forward in-process: jit compiles per placement, so the train
        step on the TPU is untouched."""
        self.state = jax.device_put(self.state, device)
        self._infer_device = device
        for attr in ("planner", "actor", "value_bcq", "_raw_planner"):
            sub = getattr(self, attr, None)
            if isinstance(sub, Algo):
                sub.set_inference_device(device)

    def _put_infer(self, tree):
        """Inference-input placement honoring ``set_inference_device``."""
        if self._infer_device is not None:
            return jax.device_put(tree, self._infer_device)
        return jax.tree.map(jnp.asarray, tree)

    def _put_batch(self, batch):
        """Host batch -> device. Shards on the leading axis when a mesh is
        attached; plain transfer otherwise."""
        if self.mesh is not None:
            from lipvq_tpu.parallel.mesh import shard_batch

            n = self.mesh.shape["data"]
            lead = {leaf.shape[0] for leaf in jax.tree.leaves(batch)
                    if hasattr(leaf, "shape") and leaf.ndim > 0}
            bad = [b for b in lead if b % n != 0]
            if bad:
                raise ValueError(
                    f"batch leading dim(s) {sorted(bad)} not divisible by "
                    f"data-parallel mesh size {n}; adjust train.batch_size"
                )
            return shard_batch(self.mesh, batch)
        return jax.tree.map(jnp.asarray, batch)

    # -- to implement ------------------------------------------------------
    def _create_networks(self):
        raise NotImplementedError

    def _create_optimizers(self):
        pass

    def process_batch_for_training(self, batch):
        return batch

    def train_on_batch(self, batch, epoch, validate: bool = False):
        raise NotImplementedError

    def get_action(self, obs_dict, goal_dict=None):
        raise NotImplementedError

    def log_info(self, info) -> dict:
        return {"Loss": float(info["losses"]["action_loss"])}

    # -- checkpointing -----------------------------------------------------
    def serialize(self) -> bytes:
        """Model state -> bytes (reference algo.py:323 state_dict)."""
        from flax import serialization

        return serialization.to_bytes(
            {"params": self.state.params, "extra_vars": self.state.extra_vars}
        )

    def deserialize(self, payload: bytes):
        from flax import serialization

        template = {"params": self.state.params,
                    "extra_vars": self.state.extra_vars}
        restored = serialization.from_bytes(template, payload)
        self.state = self.state._replace(
            params=restored["params"], extra_vars=restored["extra_vars"]
        )

    def serialize_full(self) -> bytes:
        """Full restartable state including optimizer moments + step + rng.

        The reference never checkpoints optimizer state (SURVEY.md §5.3 —
        its directory ckpt_path mode is follow-along evaluation, not true
        resume); this is the TPU-native improvement called out there.
        """
        from flax import serialization

        return serialization.to_bytes(self.state._asdict())

    def deserialize_full(self, payload: bytes):
        from flax import serialization

        template = self.state._asdict()
        restored = serialization.from_bytes(template, payload)
        self.state = type(self.state)(**restored)

    def set_train(self):
        pass

    def set_eval(self):
        pass

    def on_epoch_end(self, epoch):
        pass


class PolicyAlgo(Algo):
    """Marker base for policy algorithms (reference algo.py:353)."""
