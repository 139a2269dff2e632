"""Flax CLIP text tower parity vs the HF torch implementation.

VERDICT round-1 item 8: the weight importer is validated hermetically
against a randomly-initialized ``CLIPTextModelWithProjection`` (no
pretrained download needed) — identical architecture, so the same
importer yields real CLIP embeddings when cached weights exist.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from lipvq_tpu.models.clip_text import (  # noqa: E402
    CLIPTextConfig,
    CLIPTextTower,
    import_clip_text_state_dict,
)


def _tiny_pair(seed=0):
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=16,
        projection_dim=24,
        hidden_act="quick_gelu",
        eos_token_id=119,
    )
    torch.manual_seed(seed)
    tm = CLIPTextModelWithProjection(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=120,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_positions=16,
        projection_dim=24,
        eos_token_id=119,
    )
    tower = CLIPTextTower(cfg)
    variables = import_clip_text_state_dict(tm.state_dict(), cfg)
    return tm, tower, variables


def test_text_embeds_parity():
    tm, tower, variables = _tiny_pair()
    rng = np.random.default_rng(0)
    # EOS pooling uses argmax(input_ids): make the last real token the max
    ids = rng.integers(1, 100, size=(3, 12)).astype(np.int64)
    ids[:, -1] = 119  # highest id = EOS position
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    got = np.asarray(tower.apply(variables, ids.astype(np.int32)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-4)


def test_eos_pooling_position_varies():
    tm, tower, variables = _tiny_pair(seed=1)
    ids = np.full((2, 10), 5, np.int64)
    ids[0, 4] = 119  # EOS mid-sequence
    ids[1, 9] = 119
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    got = np.asarray(tower.apply(variables, ids.astype(np.int32)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-4)


def test_jit_compiles():
    _, tower, variables = _tiny_pair(seed=2)
    fn = jax.jit(lambda ids: tower.apply(variables, ids))
    ids = np.ones((2, 8), np.int32)
    ids[:, -1] = 119
    out = np.asarray(fn(ids))
    assert out.shape == (2, 24)
    assert np.isfinite(out).all()
