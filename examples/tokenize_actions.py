"""Tokenize action chunks with each of the swappable tokenizers
(the framework's core capability — reference README "Policy Learning"
switches)."""

import jax
import jax.numpy as jnp
import numpy as np

from lipvq_tpu.models.tokenizers.bin_action import AdaptiveBinActionEmbedding
from lipvq_tpu.models.tokenizers.fast import FastActionTokenizer
from lipvq_tpu.models.tokenizers.lipvq import LipVQVAE
from lipvq_tpu.models.tokenizers.prise import PriseTokenizer


def main():
    rng = np.random.default_rng(0)
    actions = rng.standard_normal((80, 12)).astype(np.float32) * 0.5

    # LipVQ-VAE (the paper's method)
    model = LipVQVAE(feature_dim=12, latent_dim=64, num_codes=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(actions))
    z, loss, ids = model.apply(variables, jnp.asarray(actions))
    print(f"LipVQ: latents {z.shape}, loss {float(loss):.4f}, "
          f"{len(np.unique(np.asarray(ids)))} codes used")

    # adaptive binning
    bins = AdaptiveBinActionEmbedding(action_dim=12, output_dim=64)
    bvars = bins.init(jax.random.PRNGKey(1), jnp.asarray(actions))
    emb, _ = bins.apply(bvars, jnp.asarray(actions), mutable=["bin_stats"])
    print(f"Bin: embeddings {emb.shape}")

    # FAST (DCT + BPE)
    chunks = actions.reshape(8, 10, 12)
    fast = FastActionTokenizer(vocab_size=256)
    fast.fit(chunks)
    ids = fast.encode(chunks[0])
    rec = fast.decode(ids, t=10, d=12)
    print(f"FAST: {len(ids)} tokens for a 120-float chunk, "
          f"recon MSE {np.mean((rec - chunks[0])**2):.5f}")

    # PRISE (BPE over discrete ids, native C++ backend)
    corpus = [list(rng.integers(0, 32, 8)) for _ in range(100)]
    prise = PriseTokenizer("bpe", 128)
    prise.train([[int(x) for x in w] for w in corpus], min_frequency=2,
                max_token_length=8)
    seq = [int(x) for x in corpus[0]]
    print(f"PRISE: {seq} -> {prise.encode(seq)} -> {prise.decode(prise.encode(seq))}")


if __name__ == "__main__":
    main()
