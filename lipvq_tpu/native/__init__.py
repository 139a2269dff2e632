"""Native (C++) components, built on first use.

- ``bpe`` — BPE trainer/encoder/decoder (lipvq_tpu/native/bpe.cpp), the
  TPU-native replacement for the HF `tokenizers` Rust BPE used by the
  reference's PRISE/FAST action-token paths (SURVEY.md §2.4). Compiled
  with g++ into libbpe.so and bound via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbpe.so")
_SRC = os.path.join(_DIR, "bpe.cpp")


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True,
    )


def load_bpe_lib() -> ctypes.CDLL:
    if (not os.path.exists(_SO)) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.bpe_new.restype = ctypes.c_void_p
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_train.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
    lib.bpe_vocab_size.restype = ctypes.c_int32
    lib.bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.bpe_encode.restype = ctypes.c_int32
    lib.bpe_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_int32,
    ]
    lib.bpe_decode.restype = ctypes.c_int32
    lib.bpe_token.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32
    ]
    lib.bpe_token.restype = ctypes.c_int32
    lib.bpe_serialize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32
    ]
    lib.bpe_serialize.restype = ctypes.c_int32
    lib.bpe_deserialize.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    return lib
