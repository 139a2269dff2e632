"""Mamba selective-scan numerics: the associative-scan implementation must
match a naive sequential recurrence (the CUDA kernel's semantics,
SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from lipvq_tpu.models.mamba import MambaBlock, selective_scan


def _naive_scan(x, dt, A, B, C, D):
    b, t, d = x.shape
    n = A.shape[1]
    h = np.zeros((b, d, n))
    ys = np.zeros((b, t, d))
    for ti in range(t):
        dA = np.exp(dt[:, ti, :, None] * A[None])
        dBx = (dt[:, ti] * x[:, ti])[:, :, None] * B[:, ti, None, :]
        h = dA * h + dBx
        ys[:, ti] = np.einsum("bdn,bn->bd", h, C[:, ti]) + x[:, ti] * D[None]
    return ys


def test_selective_scan_matches_naive(rng):
    b, t, d, n = 2, 12, 8, 4
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    dt = np.abs(rng.standard_normal((b, t, d))).astype(np.float32) * 0.1
    A = -np.abs(rng.standard_normal((d, n))).astype(np.float32)
    B = rng.standard_normal((b, t, n)).astype(np.float32)
    C = rng.standard_normal((b, t, n)).astype(np.float32)
    D = rng.standard_normal(d).astype(np.float32)

    y = np.asarray(selective_scan(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(D),
    ))
    y_ref = _naive_scan(x, dt, A, B, C, D)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_mamba_block_causality(rng):
    """Changing a future input must not affect past outputs."""
    block = MambaBlock(d_model=6, d_state=4, d_conv=3)
    x = jnp.asarray(rng.standard_normal((1, 10, 6)).astype(np.float32))
    v = block.init(jax.random.PRNGKey(0), x)
    y1 = block.apply(v, x)
    x2 = x.at[0, 7].set(5.0)
    y2 = block.apply(v, x2)
    np.testing.assert_allclose(
        np.asarray(y1[0, :7]), np.asarray(y2[0, :7]), rtol=1e-5, atol=1e-6
    )
    assert not np.allclose(np.asarray(y1[0, 7:]), np.asarray(y2[0, 7:]))
