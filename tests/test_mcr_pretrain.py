"""MCR ego4d representation-pretraining pipeline (VERDICT missing #6).

Mirrors reference algo/mcr/train_representation.py + data_loaders.py:
5-frame TCN sampling from a video corpus, the -L2 TCN loss with
shuffled negatives, snapshot save/load.
"""

import numpy as np
import pytest

from lipvq_tpu.algo.mcr_data import (
    MCRBuffer,
    build_synthetic_corpus,
    random_resized_crop,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mcr") / "corpus.hdf5")
    return build_synthetic_corpus(path, n_videos=4, length=16, hw=(48, 48))


def test_buffer_five_frame_sampling(corpus):
    buf = MCRBuffer(corpus, out_hw=(32, 32), seed=3)
    frames, label = buf.sample()
    assert frames.shape == (5, 32, 32, 3)
    assert frames.dtype == np.float32
    assert 0.0 <= frames.min() and frames.max() <= 1.0
    assert "moves an object" in label
    batch, labels = buf.sample_batch(3)
    assert batch.shape == (3, 5, 32, 32, 3)
    assert len(labels) == 3
    buf.close()


def test_random_resized_crop_consistency():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 40, 40, 3)).astype(np.uint8)
    out = random_resized_crop(rng, frames, out_hw=(24, 24))
    assert out.shape == (5, 24, 24, 3)
    # 'rctraj': the same crop applies to every frame — identical input
    # frames stay identical after the crop
    same = np.repeat(frames[:1], 5, axis=0)
    out2 = random_resized_crop(rng, same, out_hw=(24, 24))
    for i in range(1, 5):
        np.testing.assert_array_equal(out2[0], out2[i])


def test_workspace_trains_and_snapshots(corpus, tmp_path):
    from lipvq_tpu.scripts.train_mcr_representation import (
        RepresentationWorkspace,
    )

    ws = RepresentationWorkspace(
        corpus, batch_size=3, out_hw=(32, 32), langweight=0.1
    )
    hist = ws.train(3, log_every=0)
    assert len(hist) == 3
    for m in hist:
        assert np.isfinite(m["full_loss"]), m
        assert np.isfinite(m["tcnloss"])
        assert "langloss" in m
        assert 0.0 <= m["aligned"] <= 1.0
    ev = ws.evaluate(n_batches=1)
    assert np.isfinite(ev["full_loss"])

    snap = str(tmp_path / "snap.msgpack")
    ws.save_snapshot(snap)
    ws2 = RepresentationWorkspace(corpus, batch_size=3, out_hw=(32, 32))
    ws2.load_snapshot(snap)
    assert ws2.global_step == ws.global_step
    # restored params match bitwise
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(ws.params),
                    jax.tree_util.tree_leaves(ws2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
