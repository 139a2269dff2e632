"""HBC — hierarchical behavior cloning, and IRIS.

Counterpart of reference algo/hbc.py (344 LoC) and algo/iris.py (183 LoC):
- ``HBC``: a GL(-VAE) planner proposes subgoals (future observations)
  every ``subgoal_update_interval`` steps; a goal-conditioned BC actor
  executes toward the current subgoal (reference hbc.py:38-144).
- ``IRIS``: HBC whose planner is a ValuePlanner (GLVAE samples scored by
  a TD(0)-trained state-value net — reference iris.py uses a BCQ value
  algo; the V-net simplification is documented in gl.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from lipvq_tpu.algo.base import (
    Algo,
    register_algo_factory_func,
)
from lipvq_tpu.algo.bc import BCGMM
from lipvq_tpu.algo.gl import GL, GLVAE, ValuePlanner
from lipvq_tpu.config.config import Config


@register_algo_factory_func("hbc")
def algo_config_to_class(algo_config):
    return HBC, {}


@register_algo_factory_func("iris")
def iris_algo_config_to_class(algo_config):
    return IRIS, {}


def _sub_config(global_config, algo_section, obs_section):
    """Build a minimal standalone config for a sub-algo."""
    cfg = Config()
    cfg.algo_name = "sub"
    cfg.train = Config(global_config.train.to_dict())
    cfg.experiment = Config(global_config.experiment.to_dict())
    cfg.algo = Config(algo_section.to_dict())
    cfg.observation = Config(obs_section.to_dict())
    return cfg


class HBC(Algo):
    def __init__(self, algo_config, obs_config, global_config,
                 obs_key_shapes, ac_dim):
        self.algo_config = algo_config
        self.obs_config = obs_config
        self.global_config = global_config
        self.obs_key_shapes = obs_key_shapes
        self.ac_dim = ac_dim
        self._subgoal_update_interval = int(
            algo_config.subgoal_update_interval
        )
        self._subgoal_horizon = int(algo_config.planner.subgoal_horizon)

        planner_cls = (
            GLVAE if algo_config.planner.vae.enabled else GL
        )
        self.planner = planner_cls(
            algo_config=algo_config.planner,
            obs_config=obs_config.planner
            if "planner" in obs_config else obs_config,
            global_config=_sub_config(
                global_config, algo_config.planner,
                obs_config.planner if "planner" in obs_config else obs_config,
            ),
            obs_key_shapes=obs_key_shapes,
            ac_dim=ac_dim,
        )
        # actor is goal-conditioned on the planner's subgoal obs set, or on
        # the planner VAE's latent when latent_subgoal is enabled
        # (reference hbc.py:99-104)
        self.latent_subgoal = bool(
            algo_config.get("latent_subgoal", {}).get("enabled", False)
        )
        if self.latent_subgoal:
            assert isinstance(self.planner, GLVAE), (
                "latent_subgoal requires a VAE planner (reference hbc.py:101)"
            )
            actor_goal_shapes = {
                "latent_subgoal": (self.planner.latent_dim,)
            }
        else:
            actor_goal_shapes = (
                self.planner.subgoal_shapes
                if hasattr(self.planner, "subgoal_shapes")
                else dict(obs_key_shapes)
            )
        actor_obs_config = (
            obs_config.actor if "actor" in obs_config else obs_config
        )
        self.actor = _GoalConditionedBC(
            algo_config=algo_config.actor,
            obs_config=actor_obs_config,
            global_config=_sub_config(
                global_config, algo_config.actor, actor_obs_config
            ),
            obs_key_shapes=obs_key_shapes,
            ac_dim=ac_dim,
            subgoal_shapes=actor_goal_shapes,
        )
        self._current_subgoal = None
        self._step_counter = 0

    def _create_networks(self):
        pass

    def process_batch_for_training(self, batch):
        return {
            "planner": self.planner.process_batch_for_training(batch),
            "actor": self.actor.process_batch_for_training(batch),
        }

    def train_on_batch(self, batch, epoch, validate: bool = False):
        trainable_planner = getattr(self, "_raw_planner", self.planner)
        p_info = trainable_planner.train_on_batch(
            batch["planner"], epoch, validate=validate
        )
        # actor conditions on the planner's target subgoals (reference
        # hbc.py: actor goals = planner target subgoals), or their VAE
        # posterior latents in latent-subgoal mode
        actor_batch = dict(batch["actor"])
        if getattr(self, "latent_subgoal", False):
            z = trainable_planner.encode_latent_subgoals(
                batch["planner"]["obs"], batch["planner"]["target_subgoals"]
            )
            actor_batch["goal_obs"] = {"latent_subgoal": z}
        else:
            actor_batch["goal_obs"] = batch["planner"]["target_subgoals"]
        a_info = self.actor.train_on_batch(
            actor_batch, epoch, validate=validate
        )
        return {"losses": {
            "planner_loss": p_info["losses"]["action_loss"],
            "actor_loss": a_info["losses"]["action_loss"],
            "action_loss": a_info["losses"]["action_loss"],
        }}

    def log_info(self, info):
        return {
            "Loss": float(info["losses"]["action_loss"]),
            "Planner_Loss": float(info["losses"]["planner_loss"]),
            "Actor_Loss": float(info["losses"]["actor_loss"]),
        }

    @property
    def current_subgoal(self):
        return self._current_subgoal

    def get_action(self, obs_dict, goal_dict=None):
        if (
            self._current_subgoal is None
            or self._step_counter % self._subgoal_update_interval == 0
        ):
            if getattr(self, "latent_subgoal", False):
                planner = getattr(self, "_raw_planner", self.planner)
                z = planner.sample_latent_subgoals(obs_dict, num_samples=1)
                self._current_subgoal = {"latent_subgoal": z}
            else:
                self._current_subgoal = self.planner.get_subgoal_predictions(
                    obs_dict, goal_dict
                )
        self._step_counter += 1
        return self.actor.get_action(obs_dict, goal_dict=self._current_subgoal)

    def reset(self):
        self._current_subgoal = None
        self._step_counter = 0

    def serialize(self):
        from flax import serialization

        planner = getattr(self, "_raw_planner", self.planner)
        return serialization.msgpack_serialize(
            {"planner": planner.serialize(),
             "actor": self.actor.serialize()}
        )

    def deserialize(self, payload):
        from flax import serialization

        d = serialization.msgpack_restore(payload)
        planner = getattr(self, "_raw_planner", self.planner)
        planner.deserialize(d["planner"])
        self.actor.deserialize(d["actor"])

    def serialize_full(self):
        from flax import serialization

        planner = getattr(self, "_raw_planner", self.planner)
        return serialization.msgpack_serialize(
            {"planner": planner.serialize_full(),
             "actor": self.actor.serialize_full()}
        )

    def deserialize_full(self, payload):
        from flax import serialization

        d = serialization.msgpack_restore(payload)
        planner = getattr(self, "_raw_planner", self.planner)
        planner.deserialize_full(d["planner"])
        self.actor.deserialize_full(d["actor"])


class _GoalConditionedBC(BCGMM):
    """BC-GMM whose goal group is the planner's subgoal obs set."""

    def __init__(self, *args, subgoal_shapes=None, **kwargs):
        self._subgoal_shapes = subgoal_shapes or {}
        super().__init__(*args, **kwargs)

    def _create_shapes(self, obs_keys, obs_key_shapes):
        super()._create_shapes(obs_keys, obs_key_shapes)
        self.goal_shapes = dict(self._subgoal_shapes)

    def _dummy_inputs(self):
        return {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.obs_shapes.items()
        }

    def _init_variables(self, dummy_obs, seed):
        dummy_goal = {
            k: jnp.zeros((2,) + tuple(s), jnp.float32)
            for k, s in self.goal_shapes.items()
        }
        return self.net.init(
            {"params": jax.random.PRNGKey(seed),
             "dropout": jax.random.PRNGKey(seed + 1)},
            dummy_obs, goal=dummy_goal, train=False,
            method=type(self.net).forward_train,
        )


class IRIS(HBC):
    """HBC with a value-guided planner (reference iris.py): a BCQ value
    algorithm trains alongside, and subgoal samples are scored by BCQ's
    state value (candidate-action max of the mixed Q ensemble) — the
    reference's ValuePlanner composition (iris.py value source = BCQ)."""

    def __init__(self, algo_config, obs_config, global_config,
                 obs_key_shapes, ac_dim):
        super().__init__(algo_config, obs_config, global_config,
                         obs_key_shapes, ac_dim)
        assert isinstance(self.planner, GLVAE), "IRIS requires a VAE planner"
        from lipvq_tpu.algo.bcq import BCQ
        from lipvq_tpu.config import config_factory

        value_cfg = config_factory("bcq").algo
        if "value" in algo_config:
            value_cfg = Config(value_cfg.to_dict())
            with value_cfg.unlocked():
                value_cfg.update_from(algo_config.value.to_dict(),
                                      strict=False)
        self.value_bcq = BCQ(
            algo_config=value_cfg,
            obs_config=obs_config,
            global_config=_sub_config(global_config, value_cfg, obs_config),
            obs_key_shapes=obs_key_shapes,
            ac_dim=ac_dim,
        )

        def value_fn(subgoal_obs):
            b = self.value_bcq
            rng, key = jax.random.split(b.state.rng)
            b.state = b.state._replace(rng=rng)
            q_best, _ = b._candidate_q(
                b.state.params["critic"], b.state.params["perturb"],
                b.state.params["sampler"],
                jax.tree.map(jnp.asarray, subgoal_obs), key, b.n_samples,
            )
            return q_best

        self._raw_planner = self.planner
        self.planner = ValuePlanner(
            self._raw_planner, value_fn,
            num_samples=int(algo_config.get("num_subgoal_samples", 10)),
        )

    def process_batch_for_training(self, batch):
        return {
            "planner": self._raw_planner.process_batch_for_training(batch),
            "actor": self.actor.process_batch_for_training(batch),
            "value": self.value_bcq.process_batch_for_training(batch),
        }

    def train_on_batch(self, batch, epoch, validate: bool = False):
        info = super().train_on_batch(
            {"planner": batch["planner"], "actor": batch["actor"]},
            epoch, validate=validate,
        )
        v_info = self.value_bcq.train_on_batch(
            batch["value"], epoch, validate=validate
        )
        info["losses"]["value_loss"] = v_info["losses"]["critic_loss"]
        return info

    def serialize(self):
        from flax import serialization

        return serialization.msgpack_serialize({
            "planner": self._raw_planner.serialize(),
            "actor": self.actor.serialize(),
            "value": self.value_bcq.serialize(),
        })

    def deserialize(self, payload):
        from flax import serialization

        d = serialization.msgpack_restore(payload)
        self._raw_planner.deserialize(d["planner"])
        self.actor.deserialize(d["actor"])
        if "value" in d:
            self.value_bcq.deserialize(d["value"])
