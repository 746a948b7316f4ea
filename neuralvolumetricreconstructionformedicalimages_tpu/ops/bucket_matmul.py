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

        # payload[f=c*K+k, m] = w[k, m] * g[c, m]
        pay = jnp.concatenate([w * g[c : c + 1, :] for c in range(C)], axis=0)
        # VPU: pre-multiply the LO one-hot -> (F2*LO, M)
        p2 = (pay[:, None, :] * oh_lo[None, :, :]).reshape(C * K * _LO, _M)
        # MXU: contract the HI one-hot -> (F2*LO, HI).  HIGHEST precision:
        # TPU default would round the f32 payload to bf16 (~0.4% error).
        acc[...] += jax.lax.dot_general(
            p2,
            oh_hi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
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
) -> jax.Array:
    """Segment-sum sorted hash-grid updates into per-level gradient tables.

    Args:
      sorted_keys: [L, B] int32, ascending per level, in [0, table_size).
      sorted_frac: [L, D, B] f32 in-cell fractional positions (sorted order).
      sorted_grads: [L, C, B] f32 output gradients (sorted order).
      table_size: padded per-level table length (multiple of 2048).
      input_dim: D (2 or 3).
      interpret: force Pallas interpret mode (defaults to True off-TPU).
      out_dtype: dtype of the emitted rolled gradient (f32 or bf16; the
        in-kernel bucket accumulation is f32 either way).

    Returns:
      grad_rolled [L, C*K, table_size] ``out_dtype`` (K = 2^D) where
      ``grad_rolled[l, c*K + k, s] = sum over updates with key s of w_k * g_c``
      and ``w_k`` is the trilinear weight of corner ``k``.
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

    edges = jnp.arange(NB + 1, dtype=jnp.int32) * _W
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
    return raw.transpose(0, 1, 3, 2, 4).reshape(L, C * K, S)


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
    pay = (grads[:, :, None, :] * w[:, None, :, :]).reshape(L, C * K, B)

    def one(k_l, p_l):
        z = jnp.zeros((table_size, C * K), p_l.dtype)
        return z.at[k_l].add(p_l.T).T

    return jax.vmap(one)(keys, pay)


# ---------------------------------------------------------------------------
# Canonical-target variant: emit table-space gradients directly
# ---------------------------------------------------------------------------
#
# The rolled-output kernel above produces grad wrt the ROLLED table
# [L, C*K, S]; the caller must then apply 8 adjoint corner rolls (+512 MB
# of traffic) to reach the canonical [L, S, C] gradient (measured 9.5 ms,
# docs/profile_r3.md A5) plus a 512 MB output rearrange.  This variant
# exploits that the linear hash's corner targets are STATIC shifts of the
# sorted base keys: for corner k, the updates contributing to canonical
# bucket [b*W, (b+1)*W) occupy a contiguous window of the sorted stream,
# s in [b*W - off[l,k], b*W + W - off[l,k]) mod S — so each (level,
# bucket) program walks 8 per-corner windows (searchsorted outside) and
# accumulates straight into canonical table positions.  Output is
# [L, C, S]-shaped (64 MB at chest scale, 8x less than the rolled grad),
# and the adjoint rolls disappear entirely.
#
# MEASURED OUTCOME (docs/profile_r3.md A4b): 65.6 ms vs the rolled
# kernel's 14.3 + 9.5 ms — 2.7x SLOWER overall, because every stream
# element is re-visited once per corner (8 one-hot matmul passes) while
# the rolled kernel computes all 8 corners from a single visit.  Kept as
# a correct, tested alternative; ``backward="bucket"`` stays the default.

_W2 = 16384           # canonical bucket width = _LO2 * _HI
_LO2 = _W2 // _HI     # 128 (VPU factor; HI=128 stays the MXU factor)
_M2 = 1024            # sorted-stream chunk per inner step


def _canonical_kernel(starts_ref, offs_ref, stream_ref, out_ref, pbuf, acc,
                      sems, *, D, K, C, S):
    F1 = 1 + D + C
    l = pl.program_id(0)
    b = pl.program_id(1)
    bits = _corner_bits(D)  # [K, D] python ints

    acc[...] = jnp.zeros_like(acc)

    def _dma(start, slot):
        return pltpu.make_async_copy(
            stream_ref.at[l, :, pl.ds(start, _M2)],
            pbuf.at[slot],
            sems.at[slot],
        )

    def run(k, off, base, n, lob, hib):
        """Process one contiguous stream run [base, base + n*M2) for
        corner ``k``, masking positions outside [lob, hib).

        All DMA offsets are affine in the loop index (base + j*M2) —
        scalar ``select``s feeding DMA offsets crash the Mosaic compiler.
        """
        @pl.when(n > 0)
        def _():
            _dma(base, 0).start()

        def body(j, carry):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n)
            def _():
                _dma(base + (j + 1) * _M2, 1 - slot).start()

            _dma(base + j * _M2, slot).wait()
            chunk = pbuf[slot]  # (F1p, M2) f32
            keys = chunk[0:1, :]
            frac = chunk[1 : 1 + D, :]
            g = chunk[1 + D : F1, :]

            # Mask by exact stream POSITION range of the current run.  The
            # target-locality one-hot alone is NOT sufficient here: chunk
            # overflow past one wrap-run's end can reach positions the
            # OTHER run also processes, and those elements are genuine
            # members (double count).  Position bounds are exact; this
            # also masks sentinel padding and alignment strays.
            pos = base + j * _M2 + jax.lax.broadcasted_iota(
                jnp.int32, (1, _M2), 1)
            wk = ((pos >= lob) & (pos < hib)).astype(jnp.float32)
            for d in range(D):
                t = frac[d : d + 1, :]
                wk = wk * (t if bits[k, d] else (1.0 - t))

            # canonical target position within bucket b
            u = keys.astype(jnp.int32) + off            # [0, 2S)
            t_idx = u - jnp.where(u >= S, S, 0)         # (s + off) mod S
            t_loc = t_idx - b * _W2                     # in [0, W2) iff member
            lo_idx = jax.lax.div(t_loc, _HI)
            hi_idx = t_loc - lo_idx * _HI

            oh_hi = (
                jax.lax.broadcasted_iota(jnp.int32, (_HI, _M2), 0) == hi_idx
            ).astype(jnp.float32)
            oh_lo = (
                jax.lax.broadcasted_iota(jnp.int32, (_LO2, _M2), 0) == lo_idx
            ).astype(jnp.float32)

            pay = jnp.concatenate([wk * g[c : c + 1, :] for c in range(C)], 0)
            p2 = (pay[:, None, :] * oh_lo[None, :, :]).reshape(C * _LO2, _M2)
            acc[...] += jax.lax.dot_general(
                p2, oh_hi,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return carry

        jax.lax.fori_loop(0, n, body, 0)

    NB = pl.num_programs(1)
    for k in range(K):  # static unroll over corners
        off = offs_ref[l, k]
        # starts is [L, K*NB*3]: a flat minor dim — SMEM pads EVERY minor
        # dim to 128 lanes, so a [L, K, NB, 3] layout would inflate 16x8x
        # 32x3 ints to 2 MB and overflow the 1 MB SMEM (chest-scale
        # compile failure); flattened it stays ~50 KB.
        idx = (k * NB + b) * 3
        p0 = starts_ref[l, idx]
        p1 = starts_ref[l, idx + 1]
        p3 = starts_ref[l, idx + 2]
        p0a = (p0 // 128) * 128  # DMA lane alignment; strays self-mask
        # p1 >= p0 >= p0a always, so no clamp needed on the count.
        run(k, off, p0a, pl.cdiv(p1 - p0a, _M2), p0, p1)
        # wrap run [0, p3); count 0 when the window does not wrap
        run(k, off, 0, pl.cdiv(p3, _M2), 0, p3)

    out_ref[0] = acc[...]


def bucket_grad_matmul_canonical(
    sorted_keys: jax.Array,
    sorted_frac: jax.Array,
    sorted_grads: jax.Array,
    corner_offs,
    *,
    table_size: int,
    input_dim: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Segment-sum sorted hash-grid updates DIRECTLY into canonical
    per-level gradient tables.

    Args as :func:`bucket_grad_matmul`, plus ``corner_offs`` [L, 2^D]
    int32/numpy: the linear-hash corner offsets (``(bits . a) mod S``).

    Returns grad_table [L, S, C] f32 — no rolled intermediate, no adjoint
    rolls.
    """
    import numpy as _np

    L, B = sorted_keys.shape
    S = int(table_size)
    D = int(input_dim)
    K = 1 << D
    C = sorted_grads.shape[1]
    F1 = 1 + D + C
    F1p = -(-F1 // 8) * 8
    assert S % _W2 == 0, f"table_size {S} must be a multiple of {_W2}"
    NB = S // _W2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pad = _M2 + 256
    keys_f = jnp.pad(
        sorted_keys.astype(jnp.float32), ((0, 0), (0, pad)),
        constant_values=float(S))
    lanes = jnp.concatenate([sorted_frac, sorted_grads], axis=1)
    lanes = jnp.pad(lanes.astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
    stream = jnp.concatenate([keys_f[:, None, :], lanes], axis=1)
    stream = jnp.pad(stream, ((0, 0), (0, F1p - F1), (0, 0)))

    offs = jnp.asarray(_np.asarray(corner_offs), jnp.int32)  # [L, K]
    # Per-(level, corner, bucket) sorted-stream windows.
    bws = jnp.arange(NB, dtype=jnp.int32) * _W2              # [NB]
    w0 = (bws[None, None, :] - offs[:, :, None]) % S         # [L, K, NB]
    w1 = w0 + _W2
    wrap = w1 > S

    def _ss(keys_l, w0_l, w1_l, wrap_l):
        p0 = jnp.searchsorted(keys_l, w0_l, side="left")
        p1 = jnp.searchsorted(keys_l, jnp.minimum(w1_l, S), side="left")
        p3 = jnp.where(wrap_l,
                       jnp.searchsorted(keys_l, w1_l - S, side="left"), 0)
        return jnp.stack([p0, p1, p3], axis=-1)

    starts = jax.vmap(_ss)(sorted_keys, w0, w1, wrap).astype(jnp.int32)
    starts = starts.reshape(L, K * NB * 3)  # flat minor: see kernel note

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, C * _LO2, _HI), lambda l, b, starts, offs: (l, 0, b)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, F1p, _M2), jnp.float32),
            pltpu.VMEM((C * _LO2, _HI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    raw = pl.pallas_call(
        functools.partial(_canonical_kernel, D=D, K=K, C=C, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, C * _LO2, NB * _HI), jnp.float32,
            vma=_out_vma(sorted_keys, sorted_frac, sorted_grads)),
        interpret=interpret,
    )(starts, offs, stream)
    # raw[l, (c, lo), (b, hi)] -> grad[l, c, s], s = b*W2 + lo*HI + hi
    raw = raw.reshape(L, C, _LO2, NB, _HI)
    grad_cs = raw.transpose(0, 1, 3, 2, 4).reshape(L, C, S)
    return grad_cs.transpose(0, 2, 1)  # [L, S, C]
