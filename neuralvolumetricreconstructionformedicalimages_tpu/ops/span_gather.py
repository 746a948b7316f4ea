"""Sorted span-gather forward for the coherent hash encoder (Pallas).

This is the custom forward kernel that replaces the XLA wide-row gather
(`ops/coherent_hash.py::_gather_rolled`) on the training hot path.  The
XLA gather emitter costs ~6 ns *per row* regardless of row width — a
latency wall, not bandwidth: at chest scale (4096 rays x 192 samples x 16
levels = 12.6M rows/step) the forward gather measured ~85 ms while the
bytes moved (~800 MB) are ~1.6 ms of HBM traffic (docs/batch_scaling_r4.md).

The kernel turns the random-access gather into *sequential* streaming,
exploiting the same property the deterministic backward already uses
(`ops/bucket_matmul.py`): once the per-level base indices are sorted, the
rows needed by any chunk of the sorted stream live in one narrow,
monotonically-advancing span of the table.  Pipeline:

1. per level, sort (base index, original position, frac) —  one
   ``lax.sort`` over ``[L, B]`` with D+1 payload lanes (bitonic, VPU);
2. for every 1024-point chunk of the sorted stream, DMA the table span
   covering ``[key_first, key_last]`` HBM->VMEM (double-buffered,
   ``span_blk`` rows per sub-round; sub-round count is dynamic, so
   arbitrarily skewed chunks are exact);
3. select each point's row from the span with a Kronecker-factored
   one-hot contraction on the MXU (contraction dim 128 = the row's
   position *within* its 128-row block; the block id is selected on the
   VPU) — no serial per-row addressing anywhere;
4. trilinearly interpolate the 2^D corner features *in-kernel* (the
   rolled row holds all corners), emitting only C=2 output lanes per
   point instead of the 16-wide corner row;
5. un-permute with a second ``lax.sort`` keyed on the carried original
   positions (C payload lanes).

Expected-density note: at hashed levels the sorted keys of a 1024-point
chunk span ~1024 * S/B ~ 700 table rows at chest scale, so the whole
level's table streams through VMEM about once per step at near-HBM
bandwidth; dense coarse levels span a few dozen rows per chunk.

The table operand is the *feature-major rolled* layout
``R[l, k*C + c, s] = table[l, (s + off[l, k]) % S, c]`` (see
:func:`roll_broadcast`), whose gradient layout is exactly what
``bucket_grad_matmul`` emits — the backward is unchanged.

Replaces the forward of ``/root/reference/src/encoder/hashencoder/src/
hashencoder.cu:77-149`` (per-point CUDA gather threads) with a
TPU-native sorted streaming design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coherent_hash import (
    base_and_frac,
    base_and_frac_t,
    corner_bits,
    corner_offsets,
)
from .hash_encoding import HashGridSpec

_CHUNK = 1024      # sorted-stream points per grid program
_SPAN = 1024       # table rows DMA'd per sub-round (= 8 x 128-row blocks)
_NSB = _SPAN // 128
# Cross-program span-DMA prefetch: program p issues the first-sub-round
# span DMA for program p + _DEPTH, so _DEPTH copies are always in flight
# and the (several-us) HBM latency of the data-dependent span fetch never
# sits on a program's critical path.  TPU grid programs run sequentially
# on the core and scratch/semaphore state persists across them — the same
# property the bucket kernel's accumulator relies on.
_DEPTH = 6
_RING = _DEPTH + 1   # ring slots for first sub-rounds (one per in-flight)
_NBUF = _RING + 2    # + 2 double-buffered slots for rare extra sub-rounds


def _out_vma(*arrays) -> frozenset:
    vma: frozenset = frozenset()
    for a in arrays:
        vma = vma | getattr(jax.typeof(a), "vma", frozenset())
    return vma


def _unpack_frac(pk):
    """int32 (fx:11 | fy:11<<11 | fz:10<<22) -> (3, CHUNK) f32 in [0, 1]."""
    fx = (pk & 2047).astype(jnp.float32) * (1.0 / 2047.0)
    fy = ((jax.lax.shift_right_logical(pk, 11)) & 2047).astype(
        jnp.float32) * (1.0 / 2047.0)
    fz = ((jax.lax.shift_right_logical(pk, 22)) & 1023).astype(
        jnp.float32) * (1.0 / 1023.0)
    return jnp.concatenate([fx, fy, fz], axis=0)


def _kernel(nb_ref, nsub_ref, keys_ref, frac_ref, tab_ref, out_ref,
            tbuf, sems, *, D, K, C, table_dtype, packed_frac):
    F = K * C
    l = pl.program_id(0)
    i = pl.program_id(1)
    L = pl.num_programs(0)
    NC = pl.num_programs(1)
    flat = l * NC + i
    total = L * NC
    nb0 = nb_ref[l, i]          # span base, in 128-row blocks
    n = nsub_ref[l, i]          # sub-rounds (>= 1)

    def span_dma(fl, slot):
        """First-sub-round span DMA for flat program index ``fl``."""
        nl = jax.lax.div(fl, NC)
        ni = fl - nl * NC
        # Span bases are _SPAN-aligned (multiples of _NSB blocks) by
        # construction; Mosaic needs the hint to allow the sliced DMA on
        # packed (bf16) tilings.
        start = pl.multiple_of(nb_ref[nl, ni], _NSB)
        return pltpu.make_async_copy(
            tab_ref.at[nl, :, pl.ds(start, _NSB), :],
            tbuf.at[slot],
            sems.at[slot],
        )

    def extra_dma(j, eslot):
        """Own sub-round j >= 1 (span wider than _SPAN rows)."""
        start = pl.multiple_of(nb0 + j * _NSB, _NSB)
        return pltpu.make_async_copy(
            tab_ref.at[l, :, pl.ds(start, _NSB), :],
            tbuf.at[_RING + eslot],
            sems.at[_RING + eslot],
        )

    @pl.when(flat == 0)
    def _():
        for d in range(_DEPTH):  # bootstrap the prefetch pipeline
            if True:
                @pl.when(d < total)
                def _(d=d):
                    span_dma(d, d % _RING).start()

    @pl.when(flat + _DEPTH < total)
    def _():
        span_dma(flat + _DEPTH, (flat + _DEPTH) % _RING).start()

    @pl.when(n > 1)
    def _():
        extra_dma(1, 0).start()

    keys = keys_ref[0].astype(jnp.int32)             # (1, CHUNK); f32 keys
    local0 = keys - nb0 * 128                        # are exact < 2^24
    if packed_frac:
        frac = _unpack_frac(frac_ref[0])             # (3, CHUNK) f32
    else:
        frac = frac_ref[0]                           # (D, CHUNK) f32

    # Trilinear corner weights, one (K, CHUNK) block per chunk.
    bits = corner_bits(D)                            # [K, D] numpy
    rows = []
    for k in range(K):
        wk = jnp.ones((1, _CHUNK), jnp.float32)
        for d in range(D):
            t = frac[d : d + 1, :]
            wk = wk * (t if bits[k, d] else (1.0 - t))
        rows.append(wk)
    w = jnp.concatenate(rows, axis=0)                # (K, CHUNK)

    def compute(tb, j):
        """Trilerped feature contributions of sub-round ``j``: (C, CHUNK)."""
        tb2 = tb.reshape(F * _NSB, 128)              # row (f, q) | lane r

        # Point's row position within this sub-round's span: q*128 + r.
        loc = local0 - j * _SPAN                     # (1, CHUNK)
        q = jax.lax.div(loc, 128)
        r = loc - q * 128
        # r one-hot feeds the MXU; out-of-span points (q outside [0, NSB))
        # are zeroed by the q-selection below.  (Negative loc in (-128, 0)
        # gives q == 0 with r < 0 — matches no one-hot column either.)
        ohr = (
            jax.lax.broadcasted_iota(jnp.int32, (128, _CHUNK), 0) == r
        ).astype(table_dtype)
        # bf16 operands are exact through the MXU (one-hot selection of
        # bf16 values, f32 accumulate); f32 tables need HIGHEST or the
        # MXU default silently rounds them to bf16 (~0.4% feature error).
        res = jax.lax.dot_general(
            tb2, ohr,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(None if tb2.dtype == jnp.bfloat16
                       else jax.lax.Precision.HIGHEST),
        )                                            # (F*NSB, CHUNK) f32
        res3 = res.reshape(F, _NSB, _CHUNK)
        qoh = (
            jax.lax.broadcasted_iota(jnp.int32, (_NSB, _CHUNK), 0) == q
        ).astype(jnp.float32)
        vals = jnp.sum(res3 * qoh[None, :, :], axis=1)   # (F, CHUNK)
        # In-kernel trilerp: row f = k*C + c holds corner k of base s.
        # (Static 2-D multiply-adds: Mosaic rejects a dim-0 reduce of the
        # (K, C, CHUNK) view.)
        outs = []
        for c in range(C):
            fc = w[0:1, :] * vals[c : c + 1, :]
            for k in range(1, K):
                fc = fc + w[k : k + 1, :] * vals[k * C + c : k * C + c + 1, :]
            outs.append(fc)
        return jnp.concatenate(outs, axis=0)             # (C, CHUNK)

    span_dma(flat, jax.lax.rem(flat, _RING)).wait()
    acc = compute(tbuf[jax.lax.rem(flat, _RING)], 0)

    def body(j, acc):
        eslot = jax.lax.rem(j - 1, 2)

        @pl.when(j + 1 < n)
        def _():
            extra_dma(j + 1, 1 - eslot).start()

        extra_dma(j, eslot).wait()
        return acc + compute(tbuf[_RING + eslot], j)

    acc = jax.lax.fori_loop(1, n, body, acc)
    out_ref[0] = acc


def span_gather_sorted(
    sorted_keys: jax.Array,
    sorted_frac: jax.Array,
    rolled_fm: jax.Array,
    *,
    input_dim: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Gather + trilerp over a PRE-SORTED per-level stream.

    Args:
      sorted_keys: [L, B] int32 or float32 (exact ints), ascending per
        level, in [0, S).
      sorted_frac: [L, D, B] f32 in-cell positions in sorted order, OR
        [L, 1, B] int32 11/11/10-bit packed fracs (D must be 3).
      rolled_fm: [L, F, S] feature-major rolled table (f32 or bf16),
        row ordering ``f = k*C + c``; S a multiple of ``_SPAN``.
      input_dim: D.

    Returns:
      feats_sorted [L, C, B] f32 — interpolated features, sorted order.
    """
    L, B = sorted_keys.shape
    D = int(input_dim)
    K = 1 << D
    F, S = rolled_fm.shape[1], rolled_fm.shape[2]
    C = F // K
    packed_frac = sorted_frac.dtype == jnp.int32
    DL = 1 if packed_frac else D
    assert not packed_frac or D == 3, "packed fracs require input_dim == 3"
    assert B % _CHUNK == 0, f"stream length {B} must be a multiple of {_CHUNK}"
    assert S % _SPAN == 0, f"table size {S} must be a multiple of {_SPAN}"
    NC = B // _CHUNK
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Per-chunk span bases (aligned down to _SPAN so base + n*_SPAN <= S)
    # and dynamic sub-round counts.
    first = sorted_keys[:, ::_CHUNK].astype(jnp.int32)   # [L, NC]
    last = sorted_keys[:, _CHUNK - 1 :: _CHUNK].astype(jnp.int32)
    base = (first // _SPAN) * _SPAN
    nb0 = (base // 128).astype(jnp.int32)
    nsub = ((last - base) // _SPAN + 1).astype(jnp.int32)

    tab4 = rolled_fm.reshape(L, F, S // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, NC),
        in_specs=[
            pl.BlockSpec((1, 1, _CHUNK), lambda l, i, *s: (l, 0, i)),
            pl.BlockSpec((1, DL, _CHUNK), lambda l, i, *s: (l, 0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, C, _CHUNK), lambda l, i, *s: (l, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, F, _NSB, 128), rolled_fm.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, D=D, K=K, C=C, table_dtype=rolled_fm.dtype,
            packed_frac=packed_frac),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (L, C, B), jnp.float32,
            vma=_out_vma(sorted_keys, sorted_frac, rolled_fm)),
        interpret=interpret,
    )(nb0, nsub, sorted_keys[:, None, :], sorted_frac, tab4)


# ---------------------------------------------------------------------------
# Feature-major rolled table build / gradient reduce
# ---------------------------------------------------------------------------

def roll_broadcast_reference(table: jax.Array, spec: HashGridSpec,
                             dtype=jnp.float32) -> jax.Array:
    """Pure-XLA oracle for ``roll_kernels.roll_broadcast_fm``.

    ``R[l, k*C + c, s] = table[l, (s + off[l, k]) % S, c]`` — the row at
    ``s`` holds all 2^D corner features of base index ``s``, feature-major
    so a table span DMA is K*C parallel row streams.
    """
    L, S, C = table.shape
    K = 1 << spec.input_dim
    offs = corner_offsets(spec)                       # [L, K] numpy
    tfm = table.transpose(0, 2, 1).astype(dtype)      # [L, C, S]
    rows = []
    for k in range(K):
        for c in range(C):
            rows.append(jnp.stack(
                [jnp.roll(tfm[l, c], -int(offs[l, k])) for l in range(L)]
            ))                                        # [L, S]
    return jnp.stack(rows, axis=1)                    # [L, K*C, S]


def unroll_reduce_reference(grad_rolled: jax.Array,
                            spec: HashGridSpec) -> jax.Array:
    """Pure-XLA oracle for ``roll_kernels.unroll_reduce_fm`` (unextended
    input): [L, K*C, S] -> canonical [L, S, C].

    ``grad[l, j, c] = sum_k grad_rolled[l, k*C + c, (j - off[l, k]) % S]``.
    """
    L, F, S = grad_rolled.shape
    K = 1 << spec.input_dim
    C = F // K
    offs = corner_offsets(spec)
    chans = []
    for c in range(C):
        acc = 0.0
        for k in range(K):
            acc = acc + jnp.stack(
                [jnp.roll(grad_rolled[l, k * C + c], int(offs[l, k]))
                 for l in range(L)]
            ).astype(jnp.float32)                     # [L, S]
        chans.append(acc)
    return jnp.stack(chans, axis=-1)                  # [L, S, C]


# ---------------------------------------------------------------------------
# Full sorted-forward encode with the bucket backward
# ---------------------------------------------------------------------------

def _pad_to(x, n, axis, value):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


def pack_frac(frac: jax.Array) -> jax.Array:
    """[..., 3] f32 fracs in [0, 1) -> [...] int32, 11/11/10-bit fixed point.

    Sort payload compression: one int32 lane instead of three f32 lanes
    (the bitonic sort's cost is per lane moved).  Quantization is ~2.4e-4
    in the in-cell position — finer than the reference's own fp16 input
    cast (``hashgrid.py:12``, ~1e-3 relative).
    """
    q = jnp.clip((frac * jnp.asarray([2047.0, 2047.0, 1023.0]) + 0.5), 0,
                 jnp.asarray([2047.0, 2047.0, 1023.0])).astype(jnp.int32)
    return q[..., 0] | (q[..., 1] << 11) | (q[..., 2] << 22)


def unpack_frac(pk: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_frac`: [...] int32 -> [..., 3] f32."""
    fx = (pk & 2047).astype(jnp.float32) * (1.0 / 2047.0)
    fy = ((jax.lax.shift_right_logical(pk, 11)) & 2047).astype(
        jnp.float32) * (1.0 / 2047.0)
    fz = ((jax.lax.shift_right_logical(pk, 22)) & 1023).astype(
        jnp.float32) * (1.0 / 1023.0)
    return jnp.stack([fx, fy, fz], axis=-1)


def pack_frac_t(frac_t: jax.Array) -> jax.Array:
    """Level-major :func:`pack_frac`: [L, 3, B] f32 -> [L, B] int32."""
    hi = jnp.asarray([2047.0, 2047.0, 1023.0])[None, :, None]
    q = jnp.clip(frac_t * hi + 0.5, 0, hi).astype(jnp.int32)
    return q[:, 0] | (q[:, 1] << 11) | (q[:, 2] << 22)


def unpack_frac_t(pk: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_frac_t`: [L, B] int32 -> [L, 3, B] f32."""
    fx = (pk & 2047).astype(jnp.float32) * (1.0 / 2047.0)
    fy = ((jax.lax.shift_right_logical(pk, 11)) & 2047).astype(
        jnp.float32) * (1.0 / 2047.0)
    fz = ((jax.lax.shift_right_logical(pk, 22)) & 1023).astype(
        jnp.float32) * (1.0 / 1023.0)
    return jnp.stack([fx, fy, fz], axis=1)


def _pack_feats(fs: jax.Array) -> jax.Array:
    """[L, C=2, B] f32 -> [L, B] int32 (bf16 pair): c0 high, c1 low."""
    u = jax.lax.bitcast_convert_type(
        fs.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed = (u[:, 0] << 16) | u[:, 1]
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def _unpack_feats(pk: jax.Array) -> jax.Array:
    """[B, L] int32 -> [B, L, 2] f32 (inverse of :func:`_pack_feats`)."""
    u = jax.lax.bitcast_convert_type(pk, jnp.uint32)
    c0 = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16)
    c1 = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    return jnp.stack([c0, c1], axis=-1).astype(jnp.float32)


def sorted_encode_features(
    base_t: jax.Array, frac_t: jax.Array, rolled_fm: jax.Array,
    input_dim: int, pack: bool = True,
) -> jax.Array:
    """Point-order features [B, L*C] via sort -> span kernel -> unsort.

    Args:
      base_t: [L, B] int32 level-major base indices (``base_and_frac_t``).
      frac_t: [L, D, B] f32 level-major in-cell positions.

    ``pack=True`` (the fast path) compresses the sort payloads: fracs ride
    the forward sort as one 11/11/10-bit int32 lane and features ride the
    un-permuting sort as one bf16-pair lane — 3 and 2 sort operands
    instead of 5 and 3.  Feature precision is then bf16 (measured
    quality-neutral for training, docs/hash_quality.md); ``pack=False``
    keeps everything f32-exact.
    """
    L, B = base_t.shape
    D = int(input_dim)
    S = rolled_fm.shape[2]
    K = 1 << D
    C = rolled_fm.shape[1] // K
    Bp = -(-B // _CHUNK) * _CHUNK

    # Sort keys as FLOAT32 (exact for indices < 2^24) and without
    # stability: XLA's TPU sort measured 24.6 ms (int32 stable) vs 10.2
    # (int32 unstable) vs 3.4 (f32 unstable) for this shape — the f32
    # comparator is the fast path, and stability costs a hidden tiebreak
    # lane.  Nothing here needs tie order: duplicates are identical keys
    # (position rides along explicitly) and the un-permuting sort's keys
    # are unique.
    keys = _pad_to(base_t, Bp, 1, S - 1).astype(jnp.float32)  # [L, Bp]
    pos = jnp.broadcast_to(
        jnp.arange(Bp, dtype=jnp.float32)[None, :], (L, Bp))

    if pack and D == 3 and C == 2:
        pf = _pad_to(pack_frac_t(frac_t), Bp, 1, 0)          # [L, Bp] int32
        sk, sp, spf = jax.lax.sort(
            (keys, pos, pf), dimension=-1, num_keys=1, is_stable=False)
        feats_sorted = span_gather_sorted(
            sk, spf[:, None, :], rolled_fm, input_dim=D)     # [L, C, Bp]
        sp2, packed = jax.lax.sort(
            (sp, _pack_feats(feats_sorted)), dimension=-1, num_keys=1,
            is_stable=False)
        out = _unpack_feats(packed.T[:B])                    # [B, L, 2]
        return out.reshape(B, L * C)

    fr = _pad_to(frac_t, Bp, 2, 0.0)                         # [L, D, Bp]
    ops = jax.lax.sort(
        (keys, pos, *(fr[:, d] for d in range(D))), dimension=-1,
        num_keys=1, is_stable=False)
    sk, sp = ops[0], ops[1]
    sfr = jnp.stack(ops[2:], axis=1)                         # [L, D, Bp]

    feats_sorted = span_gather_sorted(
        sk, sfr, rolled_fm, input_dim=D)                     # [L, C, Bp]

    uns = jax.lax.sort(
        (sp, *(feats_sorted[:, c] for c in range(C))),
        dimension=-1, num_keys=1, is_stable=False)
    feats = jnp.stack(uns[1:], axis=1)                       # [L, C, Bp]
    return feats[:, :, :B].transpose(2, 0, 1).reshape(B, L * C)


def _sorted_forward(x01, table, spec: HashGridSpec, table_dtype, pack):
    from .roll_kernels import roll_broadcast_fm

    rolled_fm = roll_broadcast_fm(table, spec, table_dtype)
    base_t, frac_t = base_and_frac_t(spec, x01)
    pack = pack and spec.input_dim == 3 and spec.level_dim == 2
    if pack:
        # Quantize the residual fracs to the packed 11/11/10-bit grid so
        # the backward differentiates the function the forward computed.
        frac_t = unpack_frac_t(pack_frac_t(frac_t))
    out = sorted_encode_features(
        base_t, frac_t, rolled_fm, spec.input_dim, pack=pack)
    return out, (base_t, frac_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_encode(
    x01: jax.Array, table: jax.Array, spec: HashGridSpec,
    table_dtype=jnp.float32, pack: bool = True,
) -> jax.Array:
    """Coherent hash encode, sorted-span-gather forward: [B, D] -> [B, L*C].

    Forward: :func:`span_gather_sorted` (see module docstring).  Backward
    wrt the table: the deterministic sort + MXU bucket-matmul
    (`bucket_grad_matmul`) reduced to canonical layout by
    :func:`unroll_reduce` — numerics identical to
    ``coherent_encode(..., backward='bucket')``.

    Gradients wrt ``x01`` are NOT produced by this path (returned as
    zeros): training never differentiates wrt sample positions (rays are
    fixed geometry; every shipped loss differentiates wrt params only).
    Callers that need input gradients (``jax.grad`` wrt positions) must
    use ``coherent_encode`` / ``coherent_encode_reference`` — the encoder
    wrapper exposes this as the ``input_grads`` switch.

    ``pack`` compresses the sort payloads (11/11/10-bit fracs, bf16
    features) — see :func:`sorted_encode_features`.
    """
    return _sorted_forward(x01, table, spec, table_dtype, pack)[0]


def _se_fwd(x01, table, spec, table_dtype, pack):
    out, (base_t, frac_t) = _sorted_forward(x01, table, spec, table_dtype, pack)
    return out, (base_t, frac_t, table.shape, x01.shape)


def _se_bwd(spec, table_dtype, pack, res, g):
    from .bucket_matmul import bucket_grad_matmul
    from .roll_kernels import _PAD, unroll_reduce_fm

    base_t, frac_t, (L, S, C), x_shape = res
    D = spec.input_dim
    B = base_t.shape[1]
    g = g.reshape(B, L, C).astype(jnp.float32)

    keys = base_t.astype(jnp.float32)                        # [L, B]
    lanes = [frac_t[:, d] for d in range(D)] + [
        g[:, :, c].T for c in range(C)]
    sorted_all = jax.lax.sort((keys, *lanes), dimension=-1, num_keys=1,
                              is_stable=False)
    sk = sorted_all[0]
    sf = jnp.stack(sorted_all[1 : 1 + D], axis=1)
    sg = jnp.stack(sorted_all[1 + D :], axis=1)

    grad_rolled = bucket_grad_matmul(
        sk, sf, sg, table_size=S, input_dim=D,
        extend_cols=_PAD)                                    # [L, K*C, S+pad]
    grad_table = unroll_reduce_fm(grad_rolled, spec, C)      # [L, S, C]
    return jnp.zeros(x_shape, jnp.float32), grad_table


sorted_encode.defvjp(_se_fwd, _se_bwd)
