"""Offline tokenizer sweep — codebook sizes x EMA vs loss-based updates.

The BASELINE.json named config ("Offline tokenization sweep: full corpus,
codebook sizes 256->4096, EMA vs loss-based codebook updates"): trains a
LipVQ-VAE at each setting on an action corpus, reports reconstruction
MSE, codebook utilization (fraction of codes used), and tokenization
throughput.

    python -m lipvq_tpu.scripts.tokenizer_sweep --dataset demos.hdf5 \
        [--codebook_sizes 256 1024 4096] [--steps 300]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def load_corpus(dataset_path: str) -> np.ndarray:
    import h5py

    with h5py.File(dataset_path, "r") as f:
        demos = sorted(f["data"].keys(), key=lambda e: int(e[5:]))
        return np.concatenate(
            [np.asarray(f[f"data/{d}/actions"], np.float32) for d in demos]
        )


def train_tokenizer(corpus: np.ndarray, num_codes: int, ema: bool,
                    latent_dim: int, steps: int, batch: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from lipvq_tpu.models.tokenizers.lipvq import (
        LipVQVAE,
        apply_ema_codebook,
    )

    model = LipVQVAE(
        feature_dim=corpus.shape[1], latent_dim=latent_dim,
        num_codes=num_codes, ema_codebook=ema,
    )
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((8, corpus.shape[1])))
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adamw(1e-3, weight_decay=1e-4)  # reference icl.py:885-889
    opt_state = tx.init(params)

    @jax.jit
    def step(params, extra, opt_state, x):
        def loss_fn(p):
            out = model.apply(
                {"params": p, **extra}, x,
                mutable=list(extra.keys()) if extra else False,
            )
            if extra:
                (z, loss, ids), updates = out
            else:
                z, loss, ids = out
                updates = extra
            return loss, (ids, updates)

        (loss, (ids, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        ups, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, ups)
        if ema and updates:
            stats = updates["vq_stats"]
            cb = params["quantizer"]["codebook"]
            new_cb = apply_ema_codebook(
                cb, stats["ema_cluster_size"], stats["ema_embed_sum"]
            )
            params = {
                **params,
                "quantizer": {**params["quantizer"], "codebook": new_cb},
            }
        return params, updates, opt_state, loss, ids

    rng = np.random.default_rng(seed)
    loss = None
    for _ in range(steps):
        idx = rng.integers(0, corpus.shape[0], batch)
        params, extra, opt_state, loss, _ = step(
            params, extra, opt_state, jnp.asarray(corpus[idx])
        )

    # final metrics over the corpus
    @jax.jit
    def evaluate(params, extra, x):
        out = model.apply({"params": params, **extra}, x)
        z_latent, loss, ids = out
        recon = model.apply(
            {"params": params, **extra}, ids, method=LipVQVAE.detokenize
        )
        return jnp.mean((recon - x) ** 2), ids

    n_eval = min(corpus.shape[0], 1 << 15)
    mse, ids = evaluate(params, extra, jnp.asarray(corpus[:n_eval]))

    t0 = time.time()
    tok = jax.jit(lambda v, x: model.apply(v, x, method=LipVQVAE.tokenize))
    full = jnp.asarray(corpus)
    _ = np.asarray(tok({"params": params, **extra}, full))
    tput = corpus.shape[0] / (time.time() - t0)

    return {
        "num_codes": num_codes,
        "codebook_update": "ema" if ema else "loss",
        "final_train_loss": float(loss),
        "recon_mse": float(mse),
        "codebook_utilization": float(
            len(np.unique(np.asarray(ids))) / num_codes
        ),
        "tokenize_chunks_per_sec": round(tput, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--codebook_sizes", type=int, nargs="+",
                        default=[256, 1024, 4096])
    parser.add_argument("--latent_dim", type=int, default=64)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch", type=int, default=512)
    args = parser.parse_args()

    corpus = load_corpus(args.dataset)
    print(f"corpus: {corpus.shape[0]} chunks x {corpus.shape[1]} dims")
    results = []
    for n in args.codebook_sizes:
        for ema in (False, True):
            r = train_tokenizer(
                corpus, n, ema, args.latent_dim, args.steps, args.batch
            )
            results.append(r)
            print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
