"""Native C++ BPE vs HF tokenizers (Rust) parity + round-trip tests
(SURVEY.md §2.4: 'BPE trainer/encoder with identical merges; token IDs
must match' — segmentations are compared; id spaces differ by
construction order, so the comparison is on token *strings*)."""

import numpy as np
import pytest

from lipvq_tpu.models.tokenizers.prise import PriseTokenizer, byte_level_alphabet


def test_byte_level_alphabet_matches_hf():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers.pre_tokenizers import ByteLevel

    ours = byte_level_alphabet()
    theirs = sorted(ByteLevel().alphabet())
    assert ours == theirs


def test_textualize_roundtrip():
    tok = PriseTokenizer("bpe", 64)
    raw = [5, 17, 200, 3, 99]
    text = tok.textualize(raw)
    assert tok.detextualize(text) == raw


def _sample_corpus(rng, n_words=200, lo=0, hi=32):
    # skewed distribution so BPE finds real merges
    return [
        list(rng.choice(np.arange(lo, hi), p=None, size=rng.integers(3, 12)))
        for _ in range(n_words)
    ]


def test_train_encode_decode_roundtrip(rng):
    corpus = [[int(x) for x in w] for w in _sample_corpus(rng)]
    tok = PriseTokenizer("bpe", 128)
    tok.train(corpus, min_frequency=2, max_token_length=8)
    assert tok.vocab_size > 30  # alphabet + merges

    seq = corpus[0] + corpus[1]
    ids = tok.encode(seq)
    assert len(ids) <= len(seq)  # compression happened or equal
    back = tok.decode(ids)
    assert back == seq


def test_segmentation_matches_hf(rng):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import WhitespaceSplit
    from tokenizers.trainers import BpeTrainer

    corpus = [[int(x) for x in w] for w in _sample_corpus(rng, n_words=300)]
    ours = PriseTokenizer("bpe", 96)
    ours.train(corpus, min_frequency=2, max_token_length=16)

    hf = tokenizers.Tokenizer(BPE())
    hf.pre_tokenizer = WhitespaceSplit()
    text = ours.textualize(corpus)
    trainer = BpeTrainer(
        vocab_size=96, special_tokens=["[UNK]"], min_frequency=2,
        max_token_length=16, show_progress=False,
    )
    hf.train_from_iterator([text], trainer=trainer)

    mismatches = 0
    for w in corpus[:50]:
        t = ours.textualize(w)
        ours_toks = [ours.token_str(i) for i in ours.encode(w)]
        hf_toks = hf.encode(t).tokens
        if ours_toks != hf_toks:
            mismatches += 1
    # merge-order ties can diverge on low-count pairs; demand near-exact
    assert mismatches <= 2, f"{mismatches}/50 segmentations differ from HF"


def test_save_load(tmp_path, rng):
    corpus = [[int(x) for x in w] for w in _sample_corpus(rng)]
    tok = PriseTokenizer("bpe", 96)
    tok.train(corpus, min_frequency=2, max_token_length=8)
    seq = corpus[0]
    ids = tok.encode(seq)
    p = str(tmp_path / "bpe.model")
    tok.save(p)
    tok2 = PriseTokenizer("bpe", 96)
    tok2.load(p)
    assert tok2.encode(seq) == ids
    assert tok2.decode(ids) == seq


def test_wordpiece_and_unigram_variants(rng):
    """wordpiece/unigram ride the HF backend exactly as the reference does
    (prise/backbone.py:26-42)."""
    corpus = [[int(x) for x in rng.integers(0, 24, rng.integers(3, 10))]
              for _ in range(150)]
    for algo in ("wordpiece", "unigram"):
        tok = PriseTokenizer(algo, 96)
        tok.train(corpus, min_frequency=2, max_token_length=8)
        seq = corpus[0]
        ids = tok.encode(seq)
        assert len(ids) >= 1
        back = tok.decode(ids)
        assert back == seq, (algo, seq, back)
