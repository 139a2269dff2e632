"""FAST (DCT+BPE) tokenizer tests: reconstruction fidelity + compression +
policy-feature path."""

import numpy as np

from lipvq_tpu.models.tokenizers.fast import FastActionTokenizer
from lipvq_tpu.utils.lang_utils import LangEncoder


def _smooth_chunks(rng, n=64, t=10, d=12):
    ts = np.arange(t, dtype=np.float32)[None, :, None]
    phase = rng.uniform(0, 2 * np.pi, (n, 1, d)).astype(np.float32)
    freq = rng.uniform(0.02, 0.3, (n, 1, d)).astype(np.float32)
    return 0.7 * np.sin(freq * ts + phase).astype(np.float32)


def test_fit_encode_decode_fidelity(rng):
    chunks = _smooth_chunks(rng)
    tok = FastActionTokenizer(vocab_size=512, scale=20.0)
    tok.fit(chunks)
    errs = []
    for c in chunks[:16]:
        ids = tok.encode(c)
        rec = tok.decode(ids, t=c.shape[0], d=c.shape[1])
        errs.append(np.mean((rec - c) ** 2))
    assert np.mean(errs) < 1e-2, f"reconstruction MSE too high: {np.mean(errs)}"


def test_compression(rng):
    chunks = _smooth_chunks(rng, n=128)
    tok = FastActionTokenizer(vocab_size=1024, scale=10.0)
    tok.fit(chunks)
    raw_len = chunks.shape[1] * chunks.shape[2]
    tok_lens = [len(tok.encode(c)) for c in chunks[:32]]
    # FAST's point: smooth chunks compress well below T*D ints
    assert np.mean(tok_lens) < 0.8 * raw_len


def test_features_for_policy(rng):
    chunks = _smooth_chunks(rng, n=4)
    tok = FastActionTokenizer(vocab_size=256)
    tok.fit(chunks)
    feats = tok.features_for_policy(
        chunks, LangEncoder(), seq_len=10, feat_dim=512
    )
    assert feats.shape == (4, 10, 512)
    norms = np.linalg.norm(feats, axis=-1)
    assert ((norms < 1.0 + 1e-4)).all()  # normalized or zero-padded rows
