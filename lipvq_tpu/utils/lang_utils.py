"""Language embedding encoder.

Counterpart of reference lang_utils.py:5-36 (CLIP ViT-L/14 text encoder,
768-d output, cached per string). TPU-native: when HuggingFace CLIP weights
are available locally, the text tower runs through transformers on CPU (the
embedding is computed once per demo at dataset-load time — not a hot path);
in hermetic environments without the pretrained weights (this build
environment has zero egress) it falls back to a *deterministic* seeded
random-projection embedding so the full pipeline stays runnable — clearly
logged, and bit-stable across runs/hosts so determinism tests hold.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np

LANG_EMB_DIM = 768
_CLIP_NAME = "openai/clip-vit-large-patch14"

logger = logging.getLogger(__name__)

# model_name -> resolved backend ("clip" | "hash"), shared across instances
# so one process pays the probe (and the heavyweight transformers import)
# at most once per model.
_BACKEND_CACHE: dict = {}


def _local_weights_cached(model_name: str) -> bool:
    """Cheap filesystem probe for a HF-hub-cached snapshot — avoids even
    importing ``transformers`` (a multi-second import) when the weights
    cannot possibly load in a zero-egress environment."""
    import os

    hub_dir = os.environ.get("HF_HUB_CACHE") or os.path.join(
        os.environ.get(
            "HF_HOME", os.path.expanduser("~/.cache/huggingface")
        ),
        "hub",
    )
    snap = os.path.join(
        hub_dir, "models--" + model_name.replace("/", "--"), "snapshots"
    )
    try:
        return any(os.scandir(snap))
    except OSError:
        return False


class LangEncoder:
    def __init__(self, model_name: str = _CLIP_NAME):
        self.model_name = model_name
        self._cache: dict[str, np.ndarray] = {}
        self._model = None
        self._tokenizer = None
        self._backend = None
        self._flax_tower = None
        self._flax_vars = None

    def _load(self):
        if self._backend is not None:
            return
        # Load order: (1) locally-cached HF weights only — never touches the
        # network, so hermetic/zero-egress environments fail over in
        # milliseconds instead of stalling ~50 s in HF's retry/backoff loop;
        # (2) a network download only when LIPVQ_ALLOW_DOWNLOAD=1 is set
        # explicitly; (3) deterministic hash-projection fallback.
        import os

        allow_download = os.environ.get("LIPVQ_ALLOW_DOWNLOAD", "0") == "1"
        cached = _BACKEND_CACHE.get(self.model_name)
        if cached == "hash" or (
            cached is None
            and not allow_download
            and not _local_weights_cached(self.model_name)
        ):
            self._backend = "hash"
            _BACKEND_CACHE[self.model_name] = "hash"
            logger.warning(
                "LangEncoder: no locally-cached CLIP weights for %s; using "
                "deterministic hash-projection embeddings. Set "
                "LIPVQ_ALLOW_DOWNLOAD=1 to fetch from the hub.",
                self.model_name,
            )
            return
        try:
            # preferred: port the weights into the flax tower (TPU-native,
            # fp32-matmul parity with the torch implementation is pinned
            # by tests/test_clip_text.py)
            try:
                from lipvq_tpu.models.clip_text import load_pretrained_flax_clip

                self._flax_tower, self._flax_vars, self._tokenizer = (
                    load_pretrained_flax_clip(self.model_name)
                )
                self._backend = "clip_flax"
                _BACKEND_CACHE[self.model_name] = "clip_flax"
                logger.info(
                    "LangEncoder: using flax CLIP text tower %s",
                    self.model_name,
                )
                return
            except Exception:
                pass  # fall through to the torch tower
            from transformers import AutoTokenizer, CLIPTextModelWithProjection

            try:
                self._tokenizer = AutoTokenizer.from_pretrained(
                    self.model_name, local_files_only=True
                )
                self._model = CLIPTextModelWithProjection.from_pretrained(
                    self.model_name, local_files_only=True
                )
            except Exception:
                if not allow_download:
                    raise
                self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
                self._model = CLIPTextModelWithProjection.from_pretrained(
                    self.model_name
                )
            self._model.eval()
            self._backend = "clip"
            _BACKEND_CACHE[self.model_name] = "clip"
            logger.info("LangEncoder: using CLIP text tower %s", self.model_name)
        except Exception as e:  # no weights cached / no network
            self._backend = "hash"
            _BACKEND_CACHE[self.model_name] = "hash"
            logger.warning(
                "LangEncoder: CLIP weights unavailable (%s); using "
                "deterministic hash-projection embeddings. Closed-loop parity "
                "with reference checkpoints requires real CLIP embeddings. "
                "Set LIPVQ_ALLOW_DOWNLOAD=1 to fetch weights from the hub.",
                type(e).__name__,
            )

    @property
    def backend(self) -> str:
        """Resolved embedding backend ('clip_flax' | 'clip' | 'hash');
        recorded into checkpoints so eval-time consumers know whether
        lang_emb stats came from real CLIP or the hermetic fallback."""
        self._load()
        return self._backend

    def _hash_embed(self, text: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.sha256(text.encode()).digest()[:8], "little"
        )
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(LANG_EMB_DIM).astype(np.float32)
        return v / np.linalg.norm(v)

    def get_lang_emb(self, lang):
        """str | list[str] -> [768] | [B, 768] float32."""
        single = isinstance(lang, str)
        texts = [lang] if single else list(lang)
        missing = [t for t in texts if t not in self._cache]
        if missing:
            self._load()
            if self._backend == "clip_flax":
                toks = self._tokenizer(
                    missing, padding=True, return_tensors="np"
                )
                ids = np.asarray(toks["input_ids"], np.int32)
                embs = np.asarray(
                    self._flax_tower.apply(self._flax_vars, ids)
                )
                for t, e in zip(missing, embs):
                    self._cache[t] = e.astype(np.float32)
            elif self._backend == "clip":
                import torch

                with torch.no_grad():
                    toks = self._tokenizer(
                        missing, padding=True, return_tensors="pt"
                    )
                    out = self._model(**toks)
                    embs = out.text_embeds.float().numpy()
                for t, e in zip(missing, embs):
                    self._cache[t] = e.astype(np.float32)
            else:
                for t in missing:
                    self._cache[t] = self._hash_embed(t)
        out = np.stack([self._cache[t] for t in texts], axis=0)
        return out[0] if single else out
