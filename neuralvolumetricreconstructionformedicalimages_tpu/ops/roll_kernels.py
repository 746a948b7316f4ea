"""Pallas corner-roll kernels: canonical <-> feature-major rolled tables.

The coherent hash's defining property is that the 2^D cell corners live at
*static* table offsets from the base index (``ops/coherent_hash.py``).
The sorted span-gather forward (``ops/span_gather.py``) reads a rolled
feature-major table ``R[l, k*C+c, s] = T[l, (s+off[l,k]) % S, c]`` and the
bucket backward emits gradients in the same layout; converting between R
and the canonical table is pure data movement — K shifted copies (build)
and a K-way shifted reduction (gradient), ~0.5 GB each at chest scale.

XLA expresses these as minor-axis rolls (slice+concat pairs), measured
9-17 ms per direction on v5e — the dominant *batch-independent* step cost
(VERDICT r4 next-#2).  These kernels stream the tables once at near-HBM
bandwidth instead:

- grid over output column-blocks; the (level, corner) loop is STATICALLY
  unrolled, so every window's intra-128-lane shift ``off % 128`` is a
  compile-time constant (a static lane slice, no dynamic rotates), and
  only the 128-aligned window start is dynamic;
- the k-major row layout makes each (level, corner) window one contiguous
  [C, width] strip — a single 2-D DMA per window, ~16K DMAs per table;
- wrap-around is removed up front by extending the source with its first
  ``_PAD`` columns (a 64 MB copy on the canonical side; on the 512 MB
  gradient side the extension rides the bucket kernel's existing output
  rearrange, which XLA fuses into one copy).

Replaces the representational round-trip the reference never needed (its
CUDA backward scatters straight into table space with nondeterministic
``atomicAdd``, ``hashencoder.cu:201-272``); here the round-trip is what
buys the scatter-free deterministic backward, so its cost must be
~bandwidth, not ~XLA-roll.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coherent_hash import corner_offsets
from .hash_encoding import HashGridSpec

_BLK = 4096        # output columns per grid program
_PAD = _BLK + 128  # source window width (covers any intra-128 shift)
_INFLIGHT = 8      # window DMAs in flight


def _out_vma(*arrays) -> frozenset:
    vma: frozenset = frozenset()
    for a in arrays:
        vma = vma | getattr(jax.typeof(a), "vma", frozenset())
    return vma


def wrap_extend(x: jax.Array, pad: int) -> jax.Array:
    """Append a circularly-wrapped copy of ``x``'s first ``pad`` columns
    (tiling if ``pad`` exceeds the column count — tiny test tables)."""
    S = x.shape[-1]
    parts = [x]
    left = pad
    while left > 0:
        take = min(left, S)
        parts.append(x[..., :take])
        left -= take
    return jnp.concatenate(parts, axis=-1)


def _window_start(nb, off: int, S: int):
    """128-aligned start of the source window for output block ``nb``.

    Window = columns [nb*_BLK + off, ...) of the (virtually) circular
    source; both nb*_BLK and S are multiples of 128, so the residue
    ``off % 128`` is static and only the aligned base is dynamic.
    """
    s = nb * _BLK + (off // 128) * 128
    s = jnp.where(s >= S, s - S, s)
    return pl.multiple_of(s, 128)


def _roll_kernel(src_ref, out_ref, wbuf, sems, *, offs, S, C, K, reduce):
    """One output column-block.

    ``reduce=False`` (build): src = canonical-fm ext [L, C, S+_PAD],
    out block [L, K*C, _BLK]; window (l, k) lands at rows [k*C, (k+1)*C).

    ``reduce=True`` (gradient): src = rolled-fm ext [L, K*C, S+_PAD],
    out block [L, C, _BLK]; the K windows of level l are summed.
    Offsets are complemented: (j - off) % S == (j + S - off) % S.
    """
    nb = pl.program_id(0)
    L = len(offs)
    pairs = [(l, k) for l in range(L) for k in range(K)]

    def dma(i, slot):
        l, k = pairs[i]
        off = (S - offs[l][k]) % S if reduce else offs[l][k]
        # reduce src is reshaped [L*K, C, S+_PAD] so each window is a
        # full-row strip (sublane offsets inside a dim hit Mosaic's
        # 8-alignment rule; leading-dim indices don't).
        lead = l * K + k if reduce else l
        return pltpu.make_async_copy(
            src_ref.at[lead, :, pl.ds(_window_start(nb, off, S), _PAD)],
            wbuf.at[slot],
            sems.at[slot],
        )

    for i in range(min(_INFLIGHT, len(pairs))):
        dma(i, i).start()
    for i, (l, k) in enumerate(pairs):
        slot = i % _INFLIGHT
        dma(i, slot).wait()
        off = (S - offs[l][k]) % S if reduce else offs[l][k]
        lo = off % 128
        win = wbuf[slot][:, lo : lo + _BLK]      # (C, _BLK) static slice
        if reduce:
            if k == 0:
                out_ref[l] = win.astype(out_ref.dtype)
            else:
                out_ref[l] += win.astype(out_ref.dtype)
        else:
            out_ref[l, k * C : (k + 1) * C, :] = win
        if i + _INFLIGHT < len(pairs):
            dma(i + _INFLIGHT, slot).start()


def _offs_static(spec: HashGridSpec):
    return tuple(tuple(int(v) for v in row) for row in corner_offsets(spec))


def roll_broadcast_fm(table: jax.Array, spec: HashGridSpec,
                      dtype=jnp.float32, interpret: bool | None = None
                      ) -> jax.Array:
    """Canonical [L, S, C] -> feature-major rolled [L, K*C, S] (Pallas).

    ``R[l, k*C+c, s] = table[l, (s + off[l,k]) % S, c]``.
    """
    L, S, C = table.shape
    K = 1 << spec.input_dim
    if S % _BLK != 0:  # tiny (test-size) tables: exact XLA fallback
        from .span_gather import roll_broadcast_reference

        return roll_broadcast_reference(table, spec, dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tfm = table.transpose(0, 2, 1).astype(dtype)          # [L, C, S]
    ext = wrap_extend(tfm, _PAD)

    return pl.pallas_call(
        functools.partial(_roll_kernel, offs=_offs_static(spec), S=S, C=C,
                          K=K, reduce=False),
        grid=(S // _BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((L, K * C, _BLK), lambda nb: (0, 0, nb)),
        out_shape=jax.ShapeDtypeStruct((L, K * C, S), dtype,
                                       vma=_out_vma(table)),
        scratch_shapes=[
            pltpu.VMEM((_INFLIGHT, C, _PAD), dtype),
            pltpu.SemaphoreType.DMA((_INFLIGHT,)),
        ],
        interpret=interpret,
    )(ext)


def unroll_reduce_fm(grad_ext: jax.Array, spec: HashGridSpec,
                     n_channels: int, interpret: bool | None = None
                     ) -> jax.Array:
    """Rolled-fm gradient -> canonical [L, S, C] (Pallas).

    ``out[l, j, c] = sum_k grad[l, k*C+c, (j - off[l,k]) % S]``.

    Args:
      grad_ext: [L, K*C, S + _PAD] — the rolled gradient ALREADY extended
        with its own first ``_PAD`` columns (callers fuse this into the
        producing rearrange; see ``bucket_grad_matmul``).
    """
    L, F, Se = grad_ext.shape
    S = Se - _PAD
    C = n_channels
    K = F // C
    if S % _BLK != 0:  # tiny (test-size) tables: exact XLA fallback
        from .span_gather import unroll_reduce_reference

        return unroll_reduce_reference(
            grad_ext[:, :, :S].astype(jnp.float32), spec)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(_roll_kernel, offs=_offs_static(spec), S=S, C=C,
                          K=K, reduce=True),
        grid=(S // _BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((L, C, _BLK), lambda nb: (0, 0, nb)),
        out_shape=jax.ShapeDtypeStruct((L, C, S), jnp.float32,
                                       vma=_out_vma(grad_ext)),
        scratch_shapes=[
            pltpu.VMEM((_INFLIGHT, C, _PAD), grad_ext.dtype),
            pltpu.SemaphoreType.DMA((_INFLIGHT,)),
        ],
        interpret=interpret,
    )(grad_ext.reshape(L * K, C, Se))
    return out.transpose(0, 2, 1)                         # [L, S, C]
