"""ICL (in-context imitation learning) algorithm — jitted TPU train step.

Counterpart of reference algo/icl.py (and algo/icl_mamba.py, which is ~95%
identical — factored here behind the ``backbone`` kwarg per SURVEY.md
Appendix B.7). Key semantics preserved:

- batch halving: one loader batch is split in half — first half = context
  demos, second half = queries (reference icl.py:904-911);
- the policy trains on NLL of the query actions under the GMM
  (icl.py:947-974) with ``low_noise_eval=False`` during training;
- the VQ tokenizer trains via its own AdamW(1e-3, wd 1e-4)
  (icl.py:885-889): here one jitted step computes grads of
  ``action_loss + vq_aux_loss`` and routes them through
  ``optax.multi_transform`` — the stop-gradient boundary on the tokenizer
  output makes the two loss terms reach disjoint param sets, reproducing
  the reference's interleaved zero_grad/backward/step exactly;
- process_batch slices obs to the context length and picks
  current/future action windows (icl.py:759-794);
- get_action slices [:, 0, :] when pred_future_acs else [:, -1, :]
  (icl.py:845-852).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lipvq_tpu.algo.base import (
    PolicyAlgo,
    TrainState,
    optimizer_from_optim_params,
    register_algo_factory_func,
)
from lipvq_tpu.models.distributions import GMMParams, gmm_log_prob, gmm_sample
from lipvq_tpu.models.obs_nets import obs_spec
from lipvq_tpu.models.policy_nets import ICLActorNetwork, ICLGMMActorNetwork

_MUTABLE = ("batch_stats", "bin_stats", "spectral_stats", "vq_stats")


@register_algo_factory_func("icl")
def algo_config_to_class(algo_config):
    """Reference icl.py:26: transformer+gmm -> ICLTransformer_GMM."""
    assert algo_config.transformer.enabled
    if algo_config.gmm.enabled:
        return ICLTransformerGMM, {}
    return ICLTransformer, {}


@register_algo_factory_func("icl_mamba")
def mamba_algo_config_to_class(algo_config):
    if algo_config.gmm.enabled:
        return ICLMambaGMM, {}
    return ICLTransformer, {"backbone": "mamba"}


def _seq_section(algo_config, backbone: str):
    return algo_config.mamba if backbone == "mamba" else algo_config.transformer


# CLIP text-feature width of the FAST context stream (reference
# obs_nets.py:1306-1334 embeds stringified FAST tokens with CLIP)
_FAST_FEAT_DIM = 512


class ICLTransformerGMM(PolicyAlgo):
    """ICL training with a Transformer (or Mamba) GMM policy."""

    backbone = "transformer"
    net_cls = ICLGMMActorNetwork

    def __init__(self, *args, backbone: str | None = None, **kwargs):
        if backbone is not None:
            self.backbone = backbone
        super().__init__(*args, **kwargs)

    # -- construction ------------------------------------------------------
    def _create_networks(self):
        tc = _seq_section(self.algo_config, self.backbone)
        self.context_length = int(tc.context_length)
        self.supervise_all_steps = bool(tc.supervise_all_steps)
        self.pred_future_acs = bool(tc.pred_future_acs)
        if self.pred_future_acs:
            assert self.supervise_all_steps
        self.vq_vae_enabled = bool(tc.vq_vae_enabled)
        self.fast_enabled = bool(tc.fast_enabled)
        # FAST context stream (reference obs_nets.py:1306-1334): context
        # actions reach the encoder as DCT+BPE-token CLIP features, not
        # raw vectors. The tokenizer is fitted lazily on the first
        # training batch (the pretrained physical-intelligence/fast
        # processor is unobtainable in this zero-egress env — BASELINE.md)
        # and persisted inside the checkpoint so eval reuses the exact
        # train-time vocabulary.
        self._fast_tok = None
        self._fast_emb_cache = {}
        self._fast_lang = None
        self._fast_frozen = False  # fit accumulates early batches
        self._fast_fit_buf = []
        self._fast_missing_from_ckpt = False

        spec = obs_spec(self.obs_shapes)
        group_specs = [("obs", spec)]
        if self.goal_shapes:
            group_specs.append(("goal", obs_spec(self.goal_shapes)))
        from lipvq_tpu.utils.obs_utils import encoder_cores_from_config

        encoder_cores = encoder_cores_from_config(
            self.obs_config, self.obs_shapes
        )

        vq_cfg = self.algo_config.get("vq", {})
        self.vq_ema = bool(vq_cfg.get("ema_codebook", False))
        self.net = self.net_cls(
            group_specs=tuple(group_specs),
            ac_dim=self.ac_dim,
            embed_dim=int(tc.embed_dim),
            num_layers=int(tc.num_layers),
            num_heads=int(tc.num_heads),
            context_length=self.context_length,
            causal=bool(tc.causal),
            emb_dropout=float(tc.emb_dropout),
            attn_dropout=float(tc.attn_dropout),
            block_output_dropout=float(tc.block_output_dropout),
            sinusoidal_embedding=bool(tc.sinusoidal_embedding),
            nn_parameter_for_timesteps=bool(tc.nn_parameter_for_timesteps),
            activation=str(tc.activation),
            remat=bool(tc.get("remat", False)),
            compute_dtype=(
                None
                if str(tc.get("compute_dtype", "float32")) == "float32"
                else str(tc.get("compute_dtype"))
            ),
            activation_dtype=(
                None
                if str(tc.get("activation_dtype", "float32")) == "float32"
                else str(tc.get("activation_dtype"))
            ),
            backbone=self.backbone,
            action_input_shape=self.ac_dim,
            vq_vae_enabled=bool(tc.vq_vae_enabled),
            bin_enabled=bool(tc.bin_enabled),
            fast_enabled=bool(tc.fast_enabled),
            ln_act_enabled=bool(tc.ln_act_enabled),
            vq_num_codes=int(vq_cfg.get("num_codes", 1024)),
            vq_hidden_dim=int(vq_cfg.get("hidden_dim", 128)),
            vq_ema_codebook=self.vq_ema,
            vq_ema_decay=float(vq_cfg.get("ema_decay", 0.99)),
            encoder_cores=encoder_cores,
            num_modes=int(self.algo_config.gmm.num_modes),
            min_std=float(self.algo_config.gmm.min_std),
            std_activation=str(self.algo_config.gmm.std_activation),
            low_noise_eval=bool(self.algo_config.gmm.low_noise_eval),
        )

        # initialize params with a dummy batch
        t = self.context_length
        dummy_obs = {
            k: jnp.zeros((2, t) + tuple(shape), jnp.float32)
            for k, shape in self.obs_shapes.items()
        }
        dummy_goal = (
            {k: jnp.zeros((2, t) + tuple(s), jnp.float32)
             for k, s in self.goal_shapes.items()}
            if self.goal_shapes else None
        )
        ctx_act_dim = _FAST_FEAT_DIM if self.fast_enabled else self.ac_dim
        dummy_act = jnp.zeros((2, t, ctx_act_dim), jnp.float32)
        seed = int(self.global_config.train.seed)
        variables = self.net.init(
            {"params": jax.random.PRNGKey(seed),
             "dropout": jax.random.PRNGKey(seed + 1)},
            dummy_obs, dummy_obs, dummy_act, goal=dummy_goal, train=False,
            method=self.net_cls.forward_train,
        )
        self._params = variables["params"]
        self._extra_vars = {k: v for k, v in variables.items() if k != "params"}

    def _create_optimizers(self):
        policy_tx = optimizer_from_optim_params(
            self.algo_config.optim_params.policy,
            max_grad_norm=self.global_config.train.max_grad_norm,
        )
        if self.vq_vae_enabled:
            vq_cfg = self.algo_config.get("vq", {})
            vq_tx = optax.adamw(
                float(vq_cfg.get("optimizer_lr", 1e-3)),
                weight_decay=float(vq_cfg.get("optimizer_wd", 1e-4)),
            )

            def label_fn(params):
                flat = jax.tree_util.tree_flatten_with_path(params)[0]

                def leaf_label(path):
                    return (
                        "vq"
                        if any(
                            getattr(p, "key", None) == "action_network"
                            for p in path
                        )
                        else "policy"
                    )

                labels = [leaf_label(path) for path, _ in flat]
                treedef = jax.tree_util.tree_structure(params)
                return jax.tree_util.tree_unflatten(treedef, labels)

            tx = optax.multi_transform(
                {"policy": policy_tx, "vq": vq_tx}, label_fn
            )
        else:
            tx = policy_tx
        self.tx = tx
        seed = int(self.global_config.train.seed)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self._params,
            opt_state=tx.init(self._params),
            extra_vars=self._extra_vars,
            rng=jax.random.PRNGKey(seed + 2),
        )
        # donate the TrainState buffers: params/opt-state are overwritten
        # every step, so XLA can update in place instead of allocating a
        # second copy (halves peak HBM for the state, removes copies)
        self._jit_train_step = jax.jit(
            functools.partial(self._train_step_impl, update=True),
            donate_argnums=(0,),
        )
        self._jit_val_step = jax.jit(
            functools.partial(self._train_step_impl, update=False)
        )
        self._jit_get_action = jax.jit(self._get_action_impl)

    # -- data prep (host side, numpy) --------------------------------------
    def process_batch_for_training(self, batch):
        """Slice context window + pick action targets
        (reference icl.py:759-794); per-modality obs processing (uint8
        images -> float NHWC /255, reference postprocess_batch)."""
        from lipvq_tpu.utils.obs_utils import process_obs

        h = self.context_length
        out = {}
        out["obs"] = {
            k: process_obs(np.asarray(v)[:, :h], obs_key=k)
            for k, v in batch["obs"].items()
        }
        out["goal_obs"] = batch.get("goal_obs", None)
        actions = np.asarray(batch["actions"])
        if self.supervise_all_steps:
            ac_start = h - 1 if self.pred_future_acs else 0
            out["actions"] = actions[:, ac_start : ac_start + h]
            if self.pred_future_acs:
                assert out["actions"].shape[1] == h
        else:
            # reference slices to [B, A] here (icl.py:788) but its own ICL
            # encoder requires a [B, T, A] prompt-action window — the
            # last-step path cannot run there. Knowing fix: keep the
            # window for the context stream; the train step supervises
            # only the final timestep.
            out["actions"] = actions[:, :h]
        if self.fast_enabled:
            out["ctx_act_feat"] = self._fast_features(out["actions"])
        return out

    # -- FAST context-action features (host side) ---------------------------
    def _fast_features(self, actions: np.ndarray) -> np.ndarray:
        """[B, T, A] action windows -> [B, T, 512] CLIP features of their
        DCT+BPE token strings (reference obs_nets.py:1306-1334, batched
        per SURVEY.md §7). Fits the tokenizer on the first batch seen."""
        chunks = np.asarray(actions, np.float32)
        if self._fast_tok is None and getattr(
                self, "_fast_missing_from_ckpt", False):
            # a checkpoint that should have carried the fitted tokenizer
            # did not: fitting here would evaluate with a vocabulary
            # unrelated to training (silently wrong rollouts)
            raise RuntimeError(
                "fast_enabled checkpoint has no FASTCKPT payload; "
                "re-save the checkpoint from a FAST training run")
        if self._fast_tok is None or not getattr(
                self, "_fast_frozen", True):
            # fit over ACCUMULATED batches, not just the first one: a
            # single ~64-window batch makes the quantile bounds and BPE
            # vocabulary shuffle-order-dependent (the reference uses a
            # corpus-level pretrained tokenizer). The tokenizer refits
            # on the growing buffer each early batch and freezes once
            # ~2k windows (or 8 batches) are seen; the few early batches
            # tokenized under interim vocabularies are one-off noise in
            # a 36k-step run, and the checkpoint carries the frozen fit.
            from lipvq_tpu.models.tokenizers.fast import FastActionTokenizer

            buf = getattr(self, "_fast_fit_buf", [])
            buf.append(chunks)
            self._fast_fit_buf = buf
            corpus = np.concatenate(buf, axis=0)
            tok = FastActionTokenizer(vocab_size=1024)
            tok.fit(corpus)
            self._fast_tok = tok
            self._fast_emb_cache = {}  # vocab changed: embeddings stale
            if corpus.shape[0] >= 2048 or len(buf) >= 8:
                self._fast_frozen = True
                self._fast_fit_buf = []
            else:
                self._fast_frozen = False
        if self._fast_lang is None:
            from lipvq_tpu.utils.lang_utils import LangEncoder

            self._fast_lang = LangEncoder()

        # memoize per-token-string embeddings: the BPE vocab is <=1024
        # strings, so after warmup the text tower is never re-entered
        cache = self._fast_emb_cache

        class _CachedEncoder:
            def __init__(self, lang, store):
                self.lang, self.store = lang, store

            def get_lang_emb(self, strings):
                missing = [s for s in strings if s not in self.store]
                if missing:
                    embs = np.asarray(
                        self.lang.get_lang_emb(missing), np.float32)
                    for s, e in zip(missing, embs):
                        self.store[s] = e
                return np.stack([self.store[s] for s in strings])

        return self._fast_tok.features_for_policy(
            chunks, _CachedEncoder(self._fast_lang, cache),
            seq_len=chunks.shape[1], feat_dim=_FAST_FEAT_DIM,
        )

    # -- head-specific pieces (overridden by the non-GMM variant) ----------
    def _slice_last_step(self, dists):
        return GMMParams(
            means=dists.means[:, -1], scales=dists.scales[:, -1],
            logits=dists.logits[:, -1],
        )

    def _policy_loss(self, dists, target_act):
        """GMM NLL (reference icl.py:947-974)."""
        return -jnp.mean(gmm_log_prob(dists, target_act))

    # -- jitted step -------------------------------------------------------
    def _apply_forward(self, params, extra_vars, obs, ctx_obs, ctx_act, goal,
                      rng, train: bool, low_noise_eval: bool):
        variables = {"params": params, **extra_vars}
        mutable = [c for c in _MUTABLE if c in extra_vars] if train else []
        if not mutable:
            mutable = False  # empty-list mutable still returns (out, {})
        out = self.net.apply(
            variables, obs, ctx_obs, ctx_act, goal=goal, train=train,
            low_noise_eval=low_noise_eval,
            rngs={"dropout": rng},
            mutable=mutable,
            method=self.net_cls.forward_train,
        )
        if mutable:
            (dists, aux), updates = out
            new_extra = {**extra_vars, **updates}
        else:
            dists, aux = out
            new_extra = extra_vars
        return dists, aux, new_extra

    def _train_step_impl(self, state: TrainState, batch, update: bool = True):
        rng, drop_rng = jax.random.split(state.rng)
        obs, actions, goal = batch["obs"], batch["actions"], batch["goal_obs"]
        # split halves: first = context, second = query (icl.py:904-911)
        some = jax.tree.leaves(obs)[0]
        mid = some.shape[0] // 2
        ctx_obs = jax.tree.map(lambda a: a[:mid], obs)
        qry_obs = jax.tree.map(lambda a: a[mid:], obs)
        # FAST: the context stream consumes precomputed token features
        # (host pipeline), while supervision targets stay raw actions
        ctx_src = batch.get("ctx_act_feat", actions)
        ctx_act, qry_act = ctx_src[:mid], actions[mid:]

        def loss_fn(params):
            dists, aux, new_extra = self._apply_forward(
                params, state.extra_vars, qry_obs, ctx_obs, ctx_act, goal,
                drop_rng, train=update, low_noise_eval=False,
            )
            target_act = qry_act
            if not self.supervise_all_steps:
                dists = self._slice_last_step(dists)
                target_act = qry_act[:, -1]
            action_loss = self._policy_loss(dists, target_act)
            total = action_loss + aux
            return total, (action_loss, aux, new_extra)

        if update:
            grads, (action_loss, aux, new_extra) = jax.grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            if self.vq_vae_enabled and self.vq_ema:
                from lipvq_tpu.models.tokenizers.lipvq import apply_ema_codebook

                vq_stats = new_extra["vq_stats"]
                flat_stats = jax.tree_util.tree_leaves_with_path(vq_stats)
                stat_map = {
                    path[-1].key: leaf for path, leaf in flat_stats
                }
                tok_params = params["net"]["encoder"]["action_network"]
                cb = tok_params["quantizer"]["codebook"]
                new_cb = apply_ema_codebook(
                    cb, stat_map["ema_cluster_size"], stat_map["ema_embed_sum"]
                )
                tok_params = {
                    **tok_params,
                    "quantizer": {**tok_params["quantizer"], "codebook": new_cb},
                }
                params = {
                    **params,
                    "net": {
                        **params["net"],
                        "encoder": {
                            **params["net"]["encoder"],
                            "action_network": tok_params,
                        },
                    },
                }
            gnorm = optax.global_norm(grads)
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                extra_vars=new_extra, rng=rng,
            )
        else:
            _, (action_loss, aux, _) = loss_fn(state.params)
            gnorm = jnp.zeros(())
            new_state = state._replace(rng=rng)
        metrics = {
            "action_loss": action_loss,
            "log_probs": -action_loss,
            "vq_loss": aux,
            "policy_grad_norms": gnorm,
        }
        return new_state, metrics

    def train_on_batch(self, batch, epoch, validate: bool = False):
        batch = self._put_batch(batch)
        if validate:
            self.state, metrics = self._jit_val_step(self.state, batch)
        else:
            self.state, metrics = self._jit_train_step(self.state, batch)
        return {"losses": metrics}

    def log_info(self, info):
        log = {
            "Loss": float(info["losses"]["action_loss"]),
            "Log_Likelihood": float(info["losses"]["log_probs"]),
        }
        if self.vq_vae_enabled:
            log["VQ_Loss"] = float(info["losses"]["vq_loss"])
        if "policy_grad_norms" in info["losses"]:
            log["Policy_Grad_Norms"] = float(info["losses"]["policy_grad_norms"])
        return log

    # -- inference ---------------------------------------------------------
    def _get_action_impl(self, state: TrainState, obs, ctx_obs, ctx_act, goal,
                         key):
        dists, _, _ = self._apply_forward(
            state.params, state.extra_vars, obs, ctx_obs, ctx_act, goal,
            key, train=False, low_noise_eval=True,
        )
        out = self._action_from_head(dists, key)
        if self.supervise_all_steps and self.pred_future_acs:
            return out[:, 0]
        return out[:, -1]

    def _action_from_head(self, dists, key):
        """GMM: sample (reference policy_nets.py:2583-2599)."""
        return gmm_sample(dists, key)

    def get_action(self, obs_dict, context_batch, goal_dict=None):
        """obs_dict leaves [B, T, ...]; context_batch holds obs/actions
        (reference icl.py:827-853)."""
        rng, key = jax.random.split(self.state.rng)
        self.state = self.state._replace(rng=rng)
        ctx_act = context_batch["actions"]
        if self.fast_enabled:
            # context batches produced by process_batch_for_training carry
            # the features already; raw contexts are converted here
            ctx_act = context_batch.get("ctx_act_feat")
            if ctx_act is None:
                ctx_act = self._fast_features(
                    np.asarray(context_batch["actions"]))
        act = self._jit_get_action(
            self.state,
            self._put_infer(obs_dict),
            self._put_infer(context_batch["obs"]),
            self._put_infer(ctx_act),
            self._put_infer(goal_dict) if goal_dict else None,
            key,
        )
        return np.asarray(act)


    # -- checkpointing (FAST tokenizer rides along) -------------------------
    def _wrap_fast(self, base: bytes) -> bytes:
        """Prepend the fitted FAST tokenizer (quantile bounds + BPE
        merges) so eval/resume reproduces the exact train-time token
        stream; non-FAST payloads stay plain flax bytes."""
        if not self.fast_enabled or self._fast_tok is None:
            return base
        import tempfile

        from flax.serialization import msgpack_serialize

        tok = self._fast_tok
        with tempfile.NamedTemporaryFile(suffix=".bpe") as f:
            tok.bpe.save(f.name)
            bpe_bytes = open(f.name, "rb").read()
        # flax msgpack, NOT pickle: the repo's checkpoint format is
        # msgpack end-to-end (file_utils.py) so loading an untrusted
        # file never executes code; every field is an array/int/bytes
        return b"FASTCKPT" + msgpack_serialize(
            {"base": base,
             "fast": {"lo": np.asarray(tok.lo, np.float32),
                      "hi": np.asarray(tok.hi, np.float32),
                      "vocab_size": int(tok.vocab_size),
                      "bpe": bpe_bytes}})

    def _unwrap_fast(self, payload: bytes) -> bytes:
        if payload[:8] != b"FASTCKPT":
            if self.fast_enabled:
                # eval must never lazily re-fit an unrelated vocabulary
                self._fast_missing_from_ckpt = True
            return payload
        import tempfile

        from flax.serialization import msgpack_restore

        from lipvq_tpu.models.tokenizers.fast import FastActionTokenizer

        d = msgpack_restore(bytes(payload[8:]))
        tok = FastActionTokenizer(vocab_size=int(d["fast"]["vocab_size"]))
        tok.lo, tok.hi = d["fast"]["lo"], d["fast"]["hi"]
        with tempfile.NamedTemporaryFile(suffix=".bpe") as f:
            f.write(d["fast"]["bpe"])
            f.flush()
            tok.bpe.load(f.name)
        self._fast_tok = tok
        self._fast_frozen = True
        self._fast_emb_cache = {}
        return d["base"]

    def serialize(self) -> bytes:
        return self._wrap_fast(super().serialize())

    def deserialize(self, payload: bytes):
        super().deserialize(self._unwrap_fast(payload))

    def serialize_full(self) -> bytes:
        return self._wrap_fast(super().serialize_full())

    def deserialize_full(self, payload: bytes):
        super().deserialize_full(self._unwrap_fast(payload))


class ICLMambaGMM(ICLTransformerGMM):
    backbone = "mamba"


class ICLTransformer(ICLTransformerGMM):
    """Non-GMM ICL: deterministic tanh actor + weighted L2/SmoothL1/cosine
    loss (reference ICLTransformer, icl.py:719-853, loss weights from
    ``algo.loss.*`` per icl.py:187-201 / icl_config.py:43-45).

    The reference class is partially dead code — its ``get_action``
    forward drops the context stream (see ICLActorNetwork docstring) —
    so this implements the intended semantics with the working ICL
    machinery: 3-stream forward, context/query batch halving, separate
    VQ optimizer."""

    net_cls = ICLActorNetwork

    def _slice_last_step(self, preds):
        return preds[:, -1]

    def _policy_loss(self, preds, target_act):
        """Weighted L2 + SmoothL1 + cosine(first 3 dims)
        (reference icl.py:187-201; cosine per loss_utils.py:11-23)."""
        lw = self.algo_config.loss
        diff = preds - target_act
        l2 = jnp.mean(diff**2)
        # torch SmoothL1Loss default beta=1.0
        ad = jnp.abs(diff)
        l1 = jnp.mean(jnp.where(ad < 1.0, 0.5 * diff**2, ad - 0.5))
        p3, t3 = preds[..., :3], target_act[..., :3]
        sim = jnp.sum(p3 * t3, -1) / (
            jnp.linalg.norm(p3, axis=-1) * jnp.linalg.norm(t3, axis=-1) + 1e-8
        )
        cos = -jnp.mean(sim - 1.0)
        return (
            float(lw.l2_weight) * l2
            + float(lw.l1_weight) * l1
            + float(lw.cos_weight) * cos
        )

    def _action_from_head(self, preds, key):
        return preds
