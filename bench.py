"""Benchmark: LipVQ-VAE action-chunk tokenization throughput on TPU.

North-star metric (BASELINE.json): action chunks tokenized/sec/chip with
the fused Pallas VQ lookup, vs the reference's eager PyTorch CPU pipeline
(the reference repo is single-GPU PyTorch with an eager broadcast lookup;
torch-CPU here is the measured stand-in baseline — the reference publishes
no numbers, see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def bench_tpu(corpus: np.ndarray, model, variables) -> float:
    import jax
    import jax.numpy as jnp

    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE

    # NOTE: under the axon tunnel block_until_ready() returns at enqueue —
    # timing must force a device->host fetch. Amortize the round-trip
    # latency by enqueuing k iterations and fetching one scalar at the end.
    @jax.jit
    def tokenize_sum(v, x):
        return jnp.sum(model.apply(v, x, method=LipVQVAE.tokenize))

    x = jnp.asarray(corpus)
    float(tokenize_sum(variables, x))  # compile + warm
    k = 20
    # 12 timed reps after 2 discarded warmup reps; the headline is the
    # interquartile (trimmed) mean, which is stable under the dev
    # tunnel's additive latency noise — BENCH_r03's best-of-5 spread hit
    # 26.7% at driver time, making <25% regressions invisible
    times = []
    for _rep in range(14):
        t0 = time.time()
        for _ in range(k):
            s = tokenize_sum(variables, x)
        float(s)  # fetch once; device executed all k serially
        times.append((time.time() - t0) / k)
    times = sorted(times[2:])  # discard warmup reps, sort for quartiles
    n = corpus.shape[0]
    q = len(times) // 4
    iq = times[q:len(times) - q]  # interquartile band (middle 50%)
    trimmed = statistics.mean(iq)
    iqr_pct = 100.0 * (iq[-1] - iq[0]) / statistics.median(times)
    return {
        "trimmed_mean": n / trimmed,
        "best": n / min(times),
        "median": n / statistics.median(times),
        "worst": n / max(times),
        "iqr_pct": iqr_pct,
        "reps": len(times),
    }


def bench_device_time(corpus: np.ndarray, model, variables) -> dict:
    """Device-only throughput, immune to tunnel/dispatch drift.

    The wall metric above drifted 2.6x across one day from remote-tunnel
    state (BASELINE.md r4) — every one of its k dispatches rides the
    tunnel. Here k tokenize iterations run inside ONE jitted fori_loop
    (one dispatch, one scalar fetch), timed at two trip counts k1 < k2;
    the slope (t2 - t1) / (k2 - k1) cancels the identical per-call
    tunnel round-trip and measures pure device time per iteration. The
    loop body feeds the previous iteration's scalar back into the input
    (x + s * 1e-30) so XLA cannot hoist the loop-invariant computation.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE

    @functools.partial(jax.jit, static_argnums=2)
    def tokenize_k(v, x, k):
        def body(_, s):
            ids = model.apply(v, x + s * 1e-30, method=LipVQVAE.tokenize)
            return jnp.sum(ids).astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    x = jnp.asarray(corpus)
    k1, k2 = 4, 24
    for k in (k1, k2):  # compile both trip counts
        float(tokenize_k(variables, x, k))
    # interleave (k1, k2) pairs so slow tunnel drift hits both legs of
    # each slope estimate equally; 8 slope samples -> trimmed stats
    slopes = []
    for _rep in range(8):
        t0 = time.time()
        float(tokenize_k(variables, x, k1))
        t1 = time.time()
        float(tokenize_k(variables, x, k2))
        t2 = time.time()
        slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    slopes = sorted(slopes)
    q = len(slopes) // 4
    iq = slopes[q:len(slopes) - q]
    trimmed = statistics.mean(iq)
    n = corpus.shape[0]
    return {
        "device_trimmed_mean": n / trimmed,
        "device_best": n / min(slopes),
        "device_worst": n / max(slopes),
        "device_iqr_pct": 100.0 * (iq[-1] - iq[0])
        / statistics.median(slopes),
        "device_reps": len(slopes),
    }


def bench_torch_cpu(corpus: np.ndarray, latent_dim: int, num_codes: int,
                    params) -> float:
    """Reference-equivalent eager torch pipeline (backbone_lfqvae_v5.py
    encode + broadcast-distance lookup) on CPU, same weights."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}
    x_all = torch.from_numpy(corpus)

    def tokenize(x):
        h = F.gelu(x @ t["enc1_k"] + t["enc1_b"])
        h = F.gelu(h @ t["enc2_k"] + t["enc2_b"])
        W = t["W"]
        absrowsum = W.abs().sum(dim=1, keepdim=True)
        scale = torch.minimum(
            torch.tensor(1.0), F.softplus(t["ci"]).unsqueeze(1) / absrowsum
        )
        z = torch.sigmoid(h @ (W * scale).T + t["b"])
        cb = t["codebook"]
        d = torch.norm(z.unsqueeze(1) - cb.unsqueeze(0), dim=-1)
        return torch.argmin(d, dim=-1)

    # broadcast distances are O(B*N*D) memory — chunk like the reference's
    # per-batch eager loop would (training batch 100, icl template)
    n = x_all.shape[0]
    chunk = 256
    with torch.no_grad():
        tokenize(x_all[:chunk])  # warm up
        t0 = time.time()
        for i in range(0, n, chunk):
            tokenize(x_all[i : i + chunk])
        dt = time.time() - t0
    return n / dt


def main():
    feature_dim, latent_dim, num_codes = 12, 208, 1024
    rng = np.random.default_rng(0)
    corpus = (rng.standard_normal((1 << 20, feature_dim)) * 0.5).astype(
        np.float32
    )

    import jax
    import jax.numpy as jnp
    from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE

    n_chips = max(
        1, len([d for d in jax.devices() if d.platform != "cpu"])
    ) if jax.default_backend() != "cpu" else 1

    model = LipVQVAE(feature_dim, latent_dim, num_codes=num_codes)
    # initialize on CPU host (init on-device pays a slow remote compile);
    # use the XLA lookup path there — pallas on CPU is interpret-only
    init_model = LipVQVAE(
        feature_dim, latent_dim, num_codes=num_codes, use_pallas=False
    )
    with jax.default_device(jax.devices("cpu")[0]):
        v = init_model.init(jax.random.PRNGKey(0), jnp.zeros((128, feature_dim)))
    print("init done", file=sys.stderr)

    v_dev = jax.device_put(v)
    stats = bench_tpu(corpus, model, v_dev)
    per_chip = stats["trimmed_mean"] / n_chips
    print("tpu bench done", file=sys.stderr)
    dev_stats = bench_device_time(corpus, model, v_dev)
    dev_per_chip = dev_stats["device_trimmed_mean"] / n_chips
    print("device-time bench done", file=sys.stderr)

    p = jax.tree.map(np.asarray, v["params"])
    flat = {
        "enc1_k": p["enc1"]["kernel"], "enc1_b": p["enc1"]["bias"],
        "enc2_k": p["enc2"]["kernel"], "enc2_b": p["enc2"]["bias"],
        "W": p["to_latent"]["W"], "b": p["to_latent"]["b"],
        "ci": p["to_latent"]["ci"],
        "codebook": p["quantizer"]["codebook"],
    }
    baseline_corpus = corpus[: 1 << 13]
    torch_chunks_per_sec = bench_torch_cpu(
        baseline_corpus, latent_dim, num_codes, flat
    )

    print(
        json.dumps(
            {
                "metric": "lipvq_tokenize_chunks_per_sec_per_chip",
                # headline = interquartile mean over 12 reps (robust to
                # tunnel latency spikes; best/worst document the tails)
                "value": round(per_chip, 1),
                "unit": "chunks/s",
                "vs_baseline": round(per_chip / torch_chunks_per_sec, 2),
                "best": round(stats["best"] / n_chips, 1),
                "median": round(stats["median"] / n_chips, 1),
                "worst": round(stats["worst"] / n_chips, 1),
                "spread_pct": round(stats["iqr_pct"], 1),
                "noisy": bool(stats["iqr_pct"] >= 10.0),
                "reps": stats["reps"],
                # device-only throughput (slope over in-loop trip
                # counts): tunnel round-trips cancel, so THIS is the
                # cross-round regression gate — the wall headline above
                # drifts ~2.6x/day with remote-tunnel state
                "device_chunks_per_sec": round(dev_per_chip, 1),
                "device_vs_baseline": round(
                    dev_per_chip / torch_chunks_per_sec, 2),
                "device_spread_pct": round(
                    dev_stats["device_iqr_pct"], 1),
                "device_noisy": bool(dev_stats["device_iqr_pct"] >= 10.0),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
