"""Deterministic segment accumulation via per-bucket one-hot matmuls (Pallas).

This is the TPU-native replacement for the hash-encoder backward scatter:
the reference resolves 25.2M colliding updates per step with CUDA
``atomicAdd`` (``hashencoder.cu:201-272``, nondeterministic); XLA's scatter
lowers to a serial loop (~63 ns/update measured on v5e = 1.6 s/step,
docs/microbench_r2.md).

Here the updates are *sorted by table index* on the XLA side (batched
bitonic sort, ~12 ms for [16, 196K] with 5 payload lanes) and this kernel
reduces each width-``W`` bucket of the table with MXU matmuls:

    grad[f, w] = sum_m payload[f, m] * onehot(key_m - bucket_base, W)[w]

Design notes:

- The one-hot is never materialized at full width: with ``W = HI * LO`` it
  factors as ``onehot_hi (x) onehot_lo`` (Kronecker), so the kernel builds
  two narrow one-hots (HI + LO columns instead of W = HI*LO), pre-multiplies
  the LO factor on the VPU and contracts the HI factor on the MXU — ~20x
  less one-hot work than a naive ``[M, W]`` compare.
- The payload stream carries only ``D`` fractional-position lanes and ``C``
  output-grad lanes through the sort (lanes are what the bitonic network
  moves, so fewer lanes = faster sort); the 2^D corner weights are
  recomputed on the VPU inside the kernel.
- Buckets are walked with a *dynamic* number of fixed-size chunks
  (``cdiv(len_b, M)``), double-buffered HBM->VMEM DMAs, so arbitrarily
  skewed buckets (duplicate-heavy coarse levels) are handled exactly — no
  MAXLEN truncation anywhere.  Chunks of one bucket may overlap the
  neighbours' elements; the one-hot masks them out by construction (their
  local index falls outside [0, W)).

Everything accumulates in f32 with a fixed reduction order -> bitwise
reproducible, a deliberate upgrade over the reference (SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Bucket width W = HI * LO; M = sorted-update chunk per inner step.
# HI is the MXU-contracted factor (128 = full lane width); LO is the
# VPU-premultiplied factor.
_HI = 128
_LO = 16
_W = _HI * _LO  # 2048
_M = 512


def _corner_bits(input_dim: int) -> np.ndarray:
    n = 1 << input_dim
    return ((np.arange(n)[:, None] >> np.arange(input_dim)[None, :]) & 1).astype(
        np.int32
    )


def _out_vma(*arrays) -> frozenset:
    """Union of the inputs' varying-mesh-axes sets.

    Inside a ``check_vma=True`` shard_map, ``pallas_call`` outputs must
    declare how they vary over mesh axes (``ShapeDtypeStruct.vma``); the
    gradient tables vary over exactly the axes any input varies over.
    Outside shard_map the sets are empty and the declaration is a no-op —
    so the whole sharded step can keep JAX's per-axis variance checking ON
    (VERDICT r3 weak #5: the blanket check_vma=False exemption is gone).
    """
    vma: frozenset = frozenset()
    for a in arrays:
        vma = vma | getattr(jax.typeof(a), "vma", frozenset())
    return vma


def _kernel(starts_ref, stream_ref, out_ref, pbuf, acc, sems, *, D, K, C):
    F1 = 1 + D + C  # live lanes; pbuf/stream are padded to a multiple of 8
    b = pl.program_id(1)
    l = pl.program_id(0)
    # DMA offsets along the lane-tiled (minor) dim must be 128-aligned:
    # round the bucket start down; the leading out-of-bucket elements have
    # keys < bucket base and match no one-hot column.
    s0 = (starts_ref[l, b] // 128) * 128
    s1 = starts_ref[l, b + 1]
    n_sub = pl.cdiv(s1 - s0, _M)
    bits = _corner_bits(D)  # [K, D] python ints

    acc[...] = jnp.zeros_like(acc)

    def _dma(j, slot):
        return pltpu.make_async_copy(
            stream_ref.at[l, :, pl.ds(s0 + j * _M, _M)],
            pbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_sub > 0)
    def _():
        _dma(0, 0).start()

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_sub)
        def _():
            _dma(j + 1, 1 - slot).start()

        _dma(j, slot).wait()
        chunk = pbuf[slot]  # (F1, M) f32
        keys = chunk[0:1, :]  # (1, M), integral-valued f32
        frac = chunk[1 : 1 + D, :]  # (D, M)
        g = chunk[1 + D : F1, :]  # (C, M)

        # Corner weights w_k = prod_d (bit ? f_d : 1 - f_d)   -> (K, M)
        rows = []
        for k in range(K):
            wk = jnp.ones_like(keys)
            for d in range(D):
                t = frac[d : d + 1, :]
                wk = wk * (t if bits[k, d] else (1.0 - t))
            rows.append(wk)
        w = jnp.concatenate(rows, axis=0)  # (K, M)

        lo_full = (keys - jnp.float32(b * _W)).astype(jnp.int32)  # [0, W) iff in-bucket
        # In-bucket position s_local = lo_idx * HI + hi_idx: the MXU-
        # contracted factor (hi, 128 columns) is the *minor* 128-block
        # position, so the post-kernel (LO, NB) rearrange never moves the
        # minor dim — a near-bandwidth XLA copy instead of a strided
        # minor-dim transpose (round-3 profile fix).
        lo_idx = jax.lax.div(lo_full, _HI)
        hi_idx = lo_full - lo_idx * _HI

        # Out-of-bucket keys (bucket overlap, sentinel padding) match no
        # one-hot column: lo_idx falls outside [0, LO).  (lax.div rounds
        # toward zero; negative lo_full can only alias lo_idx == 0 with
        # hi_idx < 0, which matches no column either.)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (_HI, _M), 0) == hi_idx
        ).astype(jnp.float32)
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (_LO, _M), 0) == lo_idx
        ).astype(jnp.float32)

        # payload[f=k*C+c, m] = w[k, m] * g[c, m] — k-major rows so the
        # downstream corner-roll kernels (ops/roll_kernels.py) see each
        # corner's C channels as one contiguous strip.
        pay = (w[:, None, :] * g[None, :, :]).reshape(C * K, _M)
        # VPU: pre-multiply the LO one-hot -> (F2*LO, M)
        p2 = (pay[:, None, :] * oh_lo[None, :, :]).reshape(C * K * _LO, _M)
        # MXU: contract the HI one-hot -> (F2*LO, HI) with a manual
        # two-pass bf16 split of the f32 payload (p = hi + lo exactly
        # captures ~16 mantissa bits; the one-hot side is exact in bf16,
        # so two passes recover f32-grade accuracy at 1/3 the cost of the
        # HIGHEST 6-pass contraction this kernel used through r4 — the
        # kernel is matmul-bound.  Mosaic supports only DEFAULT/HIGHEST
        # dot precisions, hence the manual split).
        p_hi = p2.astype(jnp.bfloat16)
        p_lo = (p2 - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh_hi16 = oh_hi.astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        acc[...] += (
            jax.lax.dot_general(p_hi, oh_hi16, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(p_lo, oh_hi16, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        )
        return carry

    jax.lax.fori_loop(0, n_sub, body, 0)

    # Write the accumulator layout raw: (F2*LO, HI).  The (f, lo, b, hi)
    # -> table-column rearrangement happens outside the kernel (a cheap
    # XLA transpose); Mosaic cannot reshape across the minor dimension.
    # In-bucket accumulation is always f32; only this final store rounds
    # when the caller asked for a bf16 gradient (halves the table-shaped
    # output traffic, docs/profile_r3.md A4).
    out_ref[0] = acc[...].astype(out_ref.dtype)


def bucket_grad_matmul(
    sorted_keys: jax.Array,
    sorted_frac: jax.Array,
    sorted_grads: jax.Array,
    *,
    table_size: int,
    input_dim: int,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
    extend_cols: int = 0,
) -> jax.Array:
    """Segment-sum sorted hash-grid updates into per-level gradient tables.

    Args:
      sorted_keys: [L, B] int32 or float32 (exact integers), ascending
        per level, in [0, table_size).
      sorted_frac: [L, D, B] f32 in-cell fractional positions (sorted order).
      sorted_grads: [L, C, B] f32 output gradients (sorted order).
      table_size: padded per-level table length (multiple of 2048).
      input_dim: D (2 or 3).
      interpret: force Pallas interpret mode (defaults to True off-TPU).
      out_dtype: dtype of the emitted rolled gradient (f32 or bf16; the
        in-kernel bucket accumulation is f32 either way).
      extend_cols: append a wrapped copy of the first ``extend_cols``
        columns (for the unroll-reduce kernel's circular windows); fused
        by XLA into the output rearrange instead of costing a separate
        full-table copy.

    Returns:
      grad_rolled [L, K*C, table_size (+ extend_cols)] ``out_dtype``
      (K = 2^D) where ``grad_rolled[l, k*C + c, s] = sum over updates
      with key s of w_k * g_c`` and ``w_k`` is the trilinear weight of
      corner ``k``.
    """
    L, B = sorted_keys.shape
    S = int(table_size)
    D = int(input_dim)
    K = 1 << D
    C = sorted_grads.shape[1]
    F1 = 1 + D + C
    # DMA slices must be sublane-aligned (multiple of 8 rows on f32).
    F1p = -(-F1 // 8) * 8
    assert S % _W == 0, f"table_size {S} must be a multiple of {_W}"
    NB = S // _W
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Pad the stream so every chunk DMA [s, s+M) is in-bounds even after
    # 128-alignment of bucket starts; the sentinel key == table_size lands
    # outside every bucket's one-hot window.
    pad = _M + 256
    keys_f = jnp.pad(
        sorted_keys.astype(jnp.float32), ((0, 0), (0, pad)), constant_values=float(S)
    )
    lanes = jnp.concatenate([sorted_frac, sorted_grads], axis=1)
    lanes = jnp.pad(lanes.astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
    stream = jnp.concatenate([keys_f[:, None, :], lanes], axis=1)  # [L, F1, B+M]
    stream = jnp.pad(stream, ((0, 0), (0, F1p - F1), (0, 0)))

    edges = (jnp.arange(NB + 1, dtype=jnp.int32) * _W).astype(
        sorted_keys.dtype)
    starts = jax.vmap(lambda k: jnp.searchsorted(k, edges, side="left"))(
        sorted_keys
    ).astype(jnp.int32)  # [L, NB+1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, C * K * _LO, _HI), lambda l, b, starts: (l, 0, b)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, F1p, _M), jnp.float32),
            pltpu.VMEM((C * K * _LO, _HI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    raw = pl.pallas_call(
        functools.partial(_kernel, D=D, K=K, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, C * K * _LO, NB * _HI), out_dtype,
            vma=_out_vma(sorted_keys, sorted_frac, sorted_grads)),
        interpret=interpret,
    )(starts, stream)
    # raw[l, (f, lo), (b, hi)] -> grad[l, f, s] with s = b*W + lo*HI + hi.
    # Only the two non-minor axes (lo, b) swap; the 128-wide minor dim
    # stays contiguous, so this is a cheap block copy.
    raw = raw.reshape(L, C * K, _LO, NB, _HI)
    out = raw.transpose(0, 1, 3, 2, 4).reshape(L, C * K, S)
    if extend_cols:
        from .roll_kernels import wrap_extend

        out = wrap_extend(out, extend_cols)
    return out


def bucket_grad_matmul_reference(
    keys: jax.Array,
    frac: jax.Array,
    grads: jax.Array,
    *,
    table_size: int,
    input_dim: int,
) -> jax.Array:
    """Exact jnp oracle (plain scatter-add — slow on TPU, for tests).

    Same signature semantics as ``bucket_grad_matmul`` but keys need not be
    sorted.
    """
    L, D, B = frac.shape
    K = 1 << D
    C = grads.shape[1]
    bits = jnp.asarray(_corner_bits(D), jnp.float32)  # [K, D]
    t = jnp.where(
        bits[None, :, :, None] > 0, frac[:, None, :, :], 1.0 - frac[:, None, :, :]
    )  # [L, K, D, B]
    w = jnp.prod(t, axis=2)  # [L, K, B]
    # k-major payload rows f = k*C + c (matches bucket_grad_matmul)
    pay = (w[:, :, None, :] * grads[:, None, :, :]).reshape(L, C * K, B)

    def one(k_l, p_l):
        z = jnp.zeros((table_size, C * K), p_l.dtype)
        return z.at[k_l].add(p_l.T).T

    return jax.vmap(one)(keys, pay)


# ---------------------------------------------------------------------------
# A "canonical-target" kernel variant (emitting table-space gradients
# directly by walking 8 per-corner windows of the sorted stream) was
# shipped in r3/r4 and removed in r5: it measured 2.7x slower than this
# rolled kernel + the corner-roll reduce (every stream element re-visited
# once per corner; docs/profile_r3.md A4b, docs/batch_scaling_r4.md), and
# the Pallas unroll-reduce kernel (ops/roll_kernels.py) removed the
# adjoint-roll cost that motivated it.
