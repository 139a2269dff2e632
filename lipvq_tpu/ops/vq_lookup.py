"""Fused VQ codebook nearest-neighbor lookup — Pallas TPU kernel + XLA reference.

This is the hot op of the LipVQ-VAE tokenizer. The reference computes an
eager broadcast pairwise distance followed by argmin
(reference: robomimic/models/vq_vae/backbone_lfqvae_v5.py:37-48 — note its
"sign mask" ``clamp(2*sign(z)+1, max=1)`` is elementwise ±1 inside an L2
norm and therefore a mathematical no-op; the lookup is plain L2 nearest
neighbor). Here the lookup is one fused TPU kernel:

    scores  = z @ C^T                 (MXU, fp32 accumulation)
    dist2   = ||C||^2 - 2*scores      (VPU; ||z||^2 dropped — constant/row)
    ids     = argmin_n dist2          (lowest-index tie-break, = torch.argmin)

plus optional fused cluster statistics (one-hot counts + embed sums) for
EMA codebook updates, accumulated across grid steps.

Numerical notes (SURVEY.md §7 "hard parts"):
- fp32 accumulation in the matmul (preferred_element_type=float32);
- deterministic lowest-index tie-breaking implemented with an explicit
  iota+where reduction rather than relying on backend argmin order;
- ``vq_nearest_reference`` uses the exact difference form
  sum((z-c)^2) which matches the PyTorch computation's rounding closely;
  parity tests assert the fused expand-form kernel agrees bit-exactly on
  token IDs over fixture corpora.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference (exact difference form; used for tests + small shapes)
# ---------------------------------------------------------------------------

def vq_nearest_reference(z_e: jax.Array, codebook: jax.Array) -> jax.Array:
    """Exact-form nearest code ids. z_e [B, D], codebook [N, D] -> [B] int32."""
    d2 = jnp.sum(
        (z_e[:, None, :].astype(jnp.float32) - codebook[None, :, :].astype(jnp.float32))
        ** 2,
        axis=-1,
    )
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def vq_distances_reference(z_e: jax.Array, codebook: jax.Array) -> jax.Array:
    """Full [B, N] squared-distance matrix (expand form, fp32)."""
    z = z_e.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    zn = jnp.sum(z * z, axis=-1, keepdims=True)
    cn = jnp.sum(c * c, axis=-1)[None, :]
    return zn + cn - 2.0 * jnp.dot(z, c.T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _make_vq_kernel(mxu_precision):
    def _vq_kernel(z_ref, c_ref, cn_ref, ids_ref):
        """One grid step: a [TB, D] tile of z against the padded codebook.

        precision=HIGHEST forces true-fp32 MXU passes — Mosaic's default is
        a single bf16 pass, which flips ~0.5%% of argmins on gaussian data
        and breaks token-ID parity (measured on v5e). The 'fast' mode keeps
        the bf16 pass for serving paths that trade exactness for ~2x
        throughput (explicit opt-in)."""
        scores = jnp.dot(
            z_ref[:], c_ref[:].T, preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )  # [TB, N]
        dist2 = cn_ref[:] - 2.0 * scores  # ||z||^2 dropped: constant/row
        m = jnp.min(dist2, axis=1, keepdims=True)
        n = dist2.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, dist2.shape, 1)
        # lowest index among minima == torch.argmin first-occurrence
        ids = jnp.min(jnp.where(dist2 <= m, col, n), axis=1)
        # ids output is [TB/128, 128]: a lane-major 2D layout that keeps
        # XLA/Mosaic int32 tilings aligned without the 128x padding waste a
        # [TB, 1] layout suffers under T(8,128) tiling (VMEM-OOM at ~1M rows)
        ids_ref[:] = ids.astype(jnp.int32).reshape(-1, 128)

    return _vq_kernel


def _vq_stats_kernel(z_ref, c_ref, cn_ref, ids_ref, counts_ref, sums_ref):
    """Lookup + accumulate one-hot cluster stats for EMA codebook updates."""
    i = pl.program_id(0)
    z = z_ref[:]
    scores = jnp.dot(z, c_ref[:].T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    dist2 = cn_ref[:] - 2.0 * scores
    m = jnp.min(dist2, axis=1, keepdims=True)
    n = dist2.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, dist2.shape, 1)
    ids = jnp.min(jnp.where(dist2 <= m, col, n), axis=1)
    ids_ref[:] = ids.astype(jnp.int32).reshape(-1, 128)

    one_hot = (col == ids[:, None]).astype(jnp.float32)  # [TB, N]

    @pl.when(i == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    counts_ref[:] += jnp.sum(one_hot, axis=0, keepdims=True)
    sums_ref[:] += jnp.dot(one_hot.T, z, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)


def _pad_inputs(z_e, codebook):
    b, d = z_e.shape
    n, d2 = codebook.shape
    assert d == d2, (z_e.shape, codebook.shape)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, 128)
    z = z_e.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    if d_pad != d:
        z = jnp.pad(z, ((0, 0), (0, d_pad - d)))
        c = jnp.pad(c, ((0, 0), (0, d_pad - d)))
    cn = jnp.sum(c * c, axis=-1)
    if n_pad != n:
        c = jnp.pad(c, ((0, n_pad - n), (0, 0)))
        # padded codes get +inf squared norm so they are never selected
        cn = jnp.pad(cn, (0, n_pad - n), constant_values=jnp.inf)
    return z, c, cn[None, :], b, n


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "precision")
)
def vq_nearest_pallas(
    z_e: jax.Array,
    codebook: jax.Array,
    *,
    block_b: int = 1024,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """Fused nearest-code lookup. z_e [B, D], codebook [N, D] -> ids [B].

    precision: 'highest' (bit-exact parity, default) or 'fast' (single
    bf16 MXU pass, ~2x faster, argmins may flip on near-ties)."""
    mxu_precision = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    z, c, cn, b, n = _pad_inputs(z_e, codebook)
    d_pad = z.shape[1]
    n_pad = c.shape[0]
    b_pad = _round_up(max(b, 8), block_b)
    if b_pad != b:
        z = jnp.pad(z, ((0, b_pad - b), (0, 0)))
    grid = (b_pad // block_b,)
    ids = pl.pallas_call(
        _make_vq_kernel(mxu_precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad // 128, 128), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=4 * (b_pad * d_pad + n_pad * d_pad + b_pad),
            transcendentals=0,
        ),
    )(z, c, cn)
    return ids.reshape(b_pad)[:b]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def vq_nearest_with_stats_pallas(
    z_e: jax.Array,
    codebook: jax.Array,
    *,
    block_b: int = 1024,
    interpret: bool = False,
):
    """Fused lookup + cluster stats: -> (ids [B], counts [N], sums [N, D]).

    counts/sums are the per-batch one-hot statistics needed for EMA codebook
    updates; across a device mesh they are psum-merged by the caller
    (SURVEY.md §5.8 — the one nontrivial collective in the design).
    """
    z, c, cn, b, n = _pad_inputs(z_e, codebook)
    d_orig = z_e.shape[1]
    d_pad = z.shape[1]
    n_pad = c.shape[0]
    b_pad = _round_up(max(b, 8), block_b)
    if b_pad != b:
        z = jnp.pad(z, ((0, b_pad - b), (0, 0)))
    grid = (b_pad // block_b,)
    ids, counts, sums = pl.pallas_call(
        _vq_stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_b // 128, 128), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(z, c, cn)
    ids = ids.reshape(b_pad)
    if b_pad != b:
        # padded (zero) rows contributed to stats; subtract their counts from
        # whatever code the zero vector maps to.
        pad_ids = ids[b:]
        pad_counts = jnp.zeros((n_pad,), jnp.float32).at[pad_ids].add(1.0)
        counts = counts - pad_counts[None, :]
        # zero rows contribute zero to sums — no correction needed.
    return ids[:b], counts[0, :n], sums[:n, :d_orig]


def vq_nearest_xla_expand(z_e: jax.Array, codebook: jax.Array) -> jax.Array:
    """Expand-form lookup in plain XLA with fp32 MXU passes — the
    fallback when the fused kernel's VMEM tile budget doesn't fit
    (large latent dims); same deterministic first-min argmin."""
    z = z_e.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    cn = jnp.sum(c * c, axis=-1)[None, :]
    scores = jnp.dot(z, c.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.argmin(cn - 2.0 * scores, axis=-1).astype(jnp.int32)


def _kernel_vmem_bytes(block_b: int, n_pad: int, d_pad: int) -> int:
    """Rough VMEM footprint: double-buffered z tile + codebook + dist2."""
    return 4 * (2 * block_b * d_pad + n_pad * d_pad + block_b * n_pad)


def vq_nearest(z_e: jax.Array, codebook: jax.Array, *, use_pallas: bool | None = None):
    """Dispatching lookup: fused Pallas kernel on TPU when the tile
    budget fits VMEM, XLA expand-form otherwise, XLA reference on CPU.

    Inputs are stop-gradient'ed: the argmin ids are non-differentiable,
    and without this the pallas_call (which has no JVP rule) breaks
    reverse-mode tracing when the quantizer sits inside a train step.

    Dispatch policy (measured on v5e): inside a big jitted program a
    custom call blocks XLA fusion/pipelining — a train step with the
    fused kernel ran ~70x slower than with the XLA expand form, while on
    large standalone corpus batches the fused kernel wins. So small
    batches (train steps) take the XLA expand path and only
    corpus-scale batches (>= 64k rows) use the Pallas kernel.
    """
    z_e = jax.lax.stop_gradient(z_e)
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and z_e.shape[0] >= (1 << 16)
        )
    if not use_pallas:
        if jax.default_backend() == "tpu":
            return vq_nearest_xla_expand(z_e, codebook)
        return vq_nearest_reference(z_e, codebook)
    d_pad = _round_up(z_e.shape[1], 128)
    n_pad = _round_up(codebook.shape[0], 128)
    if _kernel_vmem_bytes(1024, n_pad, d_pad) > 12 * 1024 * 1024:
        return vq_nearest_xla_expand(z_e, codebook)
    return vq_nearest_pallas(z_e, codebook)


def vq_cluster_stats(z_e: jax.Array, ids: jax.Array, num_codes: int):
    """XLA fallback for cluster stats (segment-sum form)."""
    one_hot = jax.nn.one_hot(ids, num_codes, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    sums = jnp.dot(one_hot.T, z_e.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return counts, sums
