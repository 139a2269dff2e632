"""PRISE action tokenizer: int sequences <-> BPE tokens.

Capability parity with the reference Tokenizer
(reference: robomimic/models/prise/backbone.py:14-105): integer action-bin
sequences are "textualized" through the ByteLevel alphabet (ints ->
unicode chars), BPE-trained over whitespace-split words, encoded to token
ids, and decoded back to the original ints.

The BPE itself is the native C++ implementation
(lipvq_tpu/native/bpe.cpp) bound via ctypes — replacing the HF
`tokenizers` Rust dependency (SURVEY.md §2.4). When HF tokenizers is
installed the test suite cross-checks segmentations against it.
"""

from __future__ import annotations

import ctypes

import numpy as np

from lipvq_tpu.native import load_bpe_lib


def byte_level_alphabet() -> list[str]:
    """The 256-char GPT-2 ByteLevel alphabet, sorted — identical to
    tokenizers.pre_tokenizers.ByteLevel().alphabet() (reference
    prise/backbone.py:17-18): printable bytes map to themselves, the rest
    to 0x100+offset codepoints."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    chars = [chr(c) for c in cs]
    return sorted(chars)


class PriseTokenizer:
    """Reference-compatible API: train/textualize/encode/decode."""

    def __init__(self, algo: str = "bpe", vocab_size: int = 2048):
        self.algo = algo
        self.vocab_size = vocab_size
        self.alphabet = byte_level_alphabet()
        self.char_index_map = {
            char: str(i) for i, char in enumerate(self.alphabet)
        }
        self._hf = None
        if algo == "bpe":
            self._lib = load_bpe_lib()
            self._h = self._lib.bpe_new()
        elif algo in ("wordpiece", "unigram"):
            # wordpiece/unigram ride the HF tokenizers backend exactly as
            # the reference does (prise/backbone.py:26-42); the native C++
            # path covers the BPE default
            import tokenizers
            from tokenizers.pre_tokenizers import WhitespaceSplit

            if algo == "wordpiece":
                from tokenizers.models import WordPiece

                self._hf = tokenizers.Tokenizer(
                    WordPiece(unk_token="[UNK]",
                              max_input_chars_per_word=100000)
                )
                self._hf.decoder = tokenizers.decoders.WordPiece()
            else:
                from tokenizers.models import Unigram

                self._hf = tokenizers.Tokenizer(Unigram())
            self._hf.pre_tokenizer = WhitespaceSplit()
        else:
            raise NotImplementedError(algo)

    def __del__(self):
        try:
            if self._hf is None:
                self._lib.bpe_free(self._h)
        except Exception:
            pass

    # -- text mapping (reference prise/backbone.py:62-82) ------------------
    def textualize(self, raw) -> str:
        assert isinstance(raw, list)
        if raw and isinstance(raw[0], (int, np.integer)):
            raw = [raw]
        return " ".join(
            "".join(self.alphabet[int(c)] for c in word) for word in raw
        )

    def detextualize(self, text: str) -> list[int]:
        text = " ".join(text.replace(" ", ""))
        decoded = "".join(
            self.char_index_map.get(ch, ch) for ch in text
        )
        return [int(i) for i in decoded.split(" ")]

    # -- BPE ---------------------------------------------------------------
    def train(self, corpus, min_frequency: int = 2,
              max_token_length: int = 100, verbose: bool = False):
        text = self.textualize(corpus)
        if self._hf is not None:
            from tokenizers.trainers import UnigramTrainer, WordPieceTrainer

            trainer_cls = (
                WordPieceTrainer if self.algo == "wordpiece" else UnigramTrainer
            )
            kwargs = dict(vocab_size=self.vocab_size,
                          special_tokens=["[UNK]"], show_progress=False)
            if self.algo == "wordpiece":
                kwargs.update(min_frequency=min_frequency)
            self._hf.train_from_iterator([text], trainer=trainer_cls(**kwargs))
            self.vocab_size = self._hf.get_vocab_size()
        else:
            self._lib.bpe_train(
                self._h, text.encode("utf-8"), self.vocab_size,
                min_frequency, max_token_length,
            )
            self.vocab_size = self._lib.bpe_vocab_size(self._h)
        if verbose:
            print(f"Learned vocab size: {self.vocab_size}")

    def encode(self, raw, verbose: bool = False) -> list[int]:
        text = self.textualize(raw)
        if self._hf is not None:
            return self._hf.encode(text).ids
        cap = max(16, 4 * len(text))
        out = (ctypes.c_int32 * cap)()
        n = self._lib.bpe_encode(self._h, text.encode("utf-8"), out, cap)
        assert n <= cap
        return list(out[:n])

    def decode(self, token_ids, verbose: bool = False) -> list[int]:
        if self._hf is not None:
            text = self._hf.decode([int(i) for i in token_ids])
            return self.detextualize(text)
        ids = (ctypes.c_int32 * len(token_ids))(*[int(i) for i in token_ids])
        cap = 16 + 8 * max(1, len(token_ids)) * 8
        buf = ctypes.create_string_buffer(cap)
        n = self._lib.bpe_decode(self._h, ids, len(token_ids), buf, cap)
        assert n < cap
        text = buf.value.decode("utf-8")
        return self.detextualize(text)

    def token_str(self, token_id: int) -> str:
        buf = ctypes.create_string_buffer(1024)
        n = self._lib.bpe_token(self._h, int(token_id), buf, 1024)
        assert n >= 0
        return buf.value.decode("utf-8")

    # -- persistence -------------------------------------------------------
    def save(self, path: str):
        cap = 1 << 24
        buf = ctypes.create_string_buffer(cap)
        n = self._lib.bpe_serialize(self._h, buf, cap)
        assert n < cap
        with open(path, "wb") as f:
            f.write(buf.value)

    def load(self, path: str):
        with open(path, "rb") as f:
            blob = f.read()
        self._lib.bpe_deserialize(self._h, blob)
        self.vocab_size = self._lib.bpe_vocab_size(self._h)
