"""Coherent (linear) multiresolution hash encoding — the TPU-fast variant.

The reference encoder's XOR-prime hash (``hashencoder.cu:36-52``) is
GPU-native: every (point, level, corner) lookup is an independent random
4-byte access, absorbed by the GPU's gather hardware and L2.  A TPU has no
gather unit — XLA's gather costs ~7 ns *per row* regardless of row width
(measured on v5e, docs/microbench_r2.md), so the 25.2M two-float gathers of
a chest-scale step cost ~200 ms forward and the scatter backward ~1.6 s.

This module replaces the XOR hash with a **linear ("coherent") hash**

    index(g) = (a1*g1 + a2*g2 + a3*g3) mod 2^S          (uint32 wraparound)

chosen so that the 8 cell corners of a point live at *static offsets* from
the cell's base index:

    index(g + bits) = index(g) + (bits . a)   (mod 2^S)

That single property unlocks the TPU formulation:

- **Forward**: pre-"roll" the level table into ``[S, 8*C]`` rows whose row
  ``i`` holds all 8 corner features for base index ``i``; each
  (point, level) lookup becomes ONE wide row gather (3.1M x 32-64B rows
  instead of 25.2M x 8B) — ~10x faster, per-row-cost dominated.
- **Backward**: sort (base index, payload) per level, then accumulate with
  per-bucket one-hot matmuls on the MXU (``ops/bucket_matmul.py``) — a
  deterministic segment reduction with *zero* XLA scatters, replacing the
  reference's nondeterministic CUDA ``atomicAdd``
  (``hashencoder.cu:253-270``).

Semantics preserved from the reference (``hashgrid.py:95-113``,
``hashencoder.cu:55-149``):

- per-level scale ``2^l * H - 1``, position ``x*scale + 0.5``, trilinear
  corner weights — identical to the XOR variant;
- *dense* levels (``(res+1)^D <= 2^S``) use exactly the reference's
  row-major dense indexing — the linear hash with multipliers
  ``(1, res+1, (res+1)^2)`` IS the dense layout, so dense levels are
  bit-identical to the XOR variant;
- only the >2^19-cell levels hash differently (linear vs XOR).  Collision
  *rate* is identical (pigeonhole); collision *structure* is a lattice
  instead of pseudo-random.  Quality impact is measured empirically by
  ``scripts/compare_hash_variants.py`` (coherent vs xor, same seed/data,
  trained to convergence); committed results in ``docs/hash_quality.md``.

The pure-jnp ``coherent_encode_reference`` is the permanent correctness
oracle; ``coherent_encode`` is the fast path (rolled gather forward +
custom_vjp sort/bucket-matmul backward).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hash_encoding import HashGridSpec

# Multipliers for hashed levels: a1 = 1 keeps x-adjacent cells adjacent in
# the table (maximum memory coherence); a2/a3 are the reference's XOR
# primes reused as *linear* multipliers (hashencoder.cu:43) — large, odd,
# and empirically well-spread mod 2^19.
_LINEAR_MULTIPLIERS = (1, 19349663, 83492791)


@functools.lru_cache(maxsize=None)
def multipliers(spec: HashGridSpec) -> np.ndarray:
    """Per-level linear-hash multipliers [L, D] (int32 bit pattern).

    Dense levels get the exact dense row-major strides ``(res+1)^d``
    (reference parity, hashencoder.cu:55-65); hashed levels get the
    coherent multipliers.
    """
    D, L = spec.input_dim, spec.num_levels
    res_p1 = (spec.resolutions + 1).astype(np.uint64)
    out = np.zeros((L, D), np.uint32)
    for l in range(L):
        if spec.dense_levels[l]:
            for d in range(D):
                out[l, d] = (res_p1[l] ** d) & 0xFFFFFFFF
        else:
            out[l] = np.asarray(_LINEAR_MULTIPLIERS[:D], np.uint32)
    return out.view(np.int32)


@functools.lru_cache(maxsize=None)
def corner_bits(input_dim: int) -> np.ndarray:
    """[2^D, D] corner bit patterns, bit d of corner c = (c >> d) & 1."""
    n = 1 << input_dim
    return ((np.arange(n)[:, None] >> np.arange(input_dim)[None, :]) & 1).astype(
        np.int32
    )


@functools.lru_cache(maxsize=None)
def corner_offsets(spec: HashGridSpec) -> np.ndarray:
    """[L, 2^D] table-index offset of each corner from the base index."""
    bits = corner_bits(spec.input_dim).astype(np.int64)  # [2^D, D]
    mult = multipliers(spec).view(np.uint32).astype(np.int64)  # [L, D]
    off = (mult[:, None, :] * bits[None, :, :]).sum(-1)  # [L, 2^D]
    return (off & (spec.table_size - 1)).astype(np.int32)


def base_and_frac(spec: HashGridSpec, x01: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Base cell index (masked to the table) and fractional position.

    Returns:
      base: int32 [B, L] table index of corner 0 (already mod 2^S)
      frac: float32 [B, L, D] in-cell position
    """
    scales = jnp.asarray(spec.scales)  # [L]
    pos = x01[:, None, :].astype(jnp.float32) * scales[None, :, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid  # [B, L, D]
    g = pos_grid.astype(jnp.int32)  # [B, L, D]
    mult = jnp.asarray(multipliers(spec))  # [L, D]
    # int32 wraparound multiply-add == uint32 mod-2^32; mod 2^S divides it.
    raw = jnp.sum(g * mult[None, :, :], axis=-1)  # [B, L]
    return raw & jnp.int32(spec.table_size - 1), frac


def base_and_frac_t(spec: HashGridSpec, x01: jax.Array):
    """Level-major variant of :func:`base_and_frac`.

    Returns ``base`` [L, B] int32 and ``frac`` [L, D, B] f32 — the layout
    the per-level sorts consume directly, so the sorted forward/backward
    skip ~200 MB of pre-sort transposes at the 4096-ray chest step.
    """
    xT = x01.T.astype(jnp.float32)                          # [D, B]
    scales = jnp.asarray(spec.scales)                       # [L]
    pos = xT[None, :, :] * scales[:, None, None] + 0.5      # [L, D, B]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    g = pos_grid.astype(jnp.int32)
    mult = jnp.asarray(multipliers(spec))                   # [L, D]
    raw = jnp.sum(g * mult[:, :, None], axis=1)             # [L, B]
    return raw & jnp.int32(spec.table_size - 1), frac


def corner_weights(spec: HashGridSpec, frac: jax.Array) -> jax.Array:
    """Trilinear weights [B, L, 2^D] from frac [B, L, D]."""
    bits = jnp.asarray(corner_bits(spec.input_dim), jnp.float32)  # [2^D, D]
    t = jnp.where(
        bits[None, None] > 0, frac[:, :, None, :], 1.0 - frac[:, :, None, :]
    )
    return jnp.prod(t, axis=-1)


def corner_weight_grads(spec: HashGridSpec, frac: jax.Array) -> jax.Array:
    """d(weight)/d(frac): [B, L, 2^D, D].

    dw_k/df_d = sign_d(k) * prod_{e != d} t_e(k)  with t_e = bit ? f : 1-f.
    Computed by explicit products (no division — stable at f in {0, 1}).
    """
    D = spec.input_dim
    bits = jnp.asarray(corner_bits(D), jnp.float32)  # [2^D, D]
    t = jnp.where(
        bits[None, None] > 0, frac[:, :, None, :], 1.0 - frac[:, :, None, :]
    )  # [B, L, 2^D, D]
    sign = jnp.where(bits[None, None] > 0, 1.0, -1.0)
    grads = []
    for d in range(D):
        prod = sign[..., d]
        for e in range(D):
            if e != d:
                prod = prod * t[..., e]
        grads.append(prod)
    return jnp.stack(grads, axis=-1)


def coherent_encode_reference(
    x01: jax.Array, table: jax.Array, spec: HashGridSpec
) -> jax.Array:
    """Pure-jnp oracle for the coherent variant (slow path, autodiff bwd).

    Same gather structure as ``hash_encoding.hash_encode`` but with linear
    corner indexing.  Differentiable in both arguments.
    """
    B = x01.shape[0]
    L, S, C = table.shape
    base, frac = base_and_frac(spec, x01)
    w = corner_weights(spec, frac)  # [B, L, 2^D]
    offs = jnp.asarray(corner_offsets(spec))  # [L, 2^D]
    idx = (base[:, :, None] + offs[None]) & jnp.int32(S - 1)  # [B, L, 2^D]
    level_offsets = jnp.arange(L, dtype=jnp.int32)[None, :, None] * jnp.int32(S)
    vals = jnp.take(table.reshape(L * S, C), idx + level_offsets, axis=0)
    out = jnp.sum(w[..., None].astype(vals.dtype) * vals, axis=2)  # [B, L, C]
    return out.reshape(B, L * C).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Fast path
# ---------------------------------------------------------------------------

def build_rolled_table(
    table: jax.Array, spec: HashGridSpec, dtype=jnp.float32
) -> jax.Array:
    """[L, S, C] canonical table -> [L, S, 2^D * C] rolled corner table.

    Row ``i`` of level ``l`` holds feature ``c`` of corner ``k`` at column
    ``k * C + c``:  rolled[l, i, k*C + c] = table[l, (i + off[l,k]) % S, c].

    Built as ``[L, K, S, C]`` — every per-(level, corner) roll is a pure
    contiguous two-slice copy of a ``[S, C]`` block (jnp.roll with a
    static Python shift lowers to slices + concat; a traced shift would
    lower to a dynamic gather costing minutes of compile at 2^19) — then
    one transpose interleaves the K corner blocks.  The earlier layout
    (column-by-column stack into the minor dim) forced XLA into strided
    4-byte writes.
    """
    L, S, C = table.shape
    n_corners = 1 << spec.input_dim
    offs = corner_offsets(spec)  # [L, n_corners] numpy
    table = table.astype(dtype)
    per_corner = jnp.stack(
        [
            jnp.stack([jnp.roll(table[l], -int(offs[l, k]), axis=0)
                       for k in range(n_corners)])
            for l in range(L)
        ]
    )  # [L, K, S, C]
    return per_corner.transpose(0, 2, 1, 3).reshape(L, S, n_corners * C)


def _gather_rolled(rolled: jax.Array, base: jax.Array) -> jax.Array:
    """Per-level wide-row gather: rolled [L, S, F], base [B, L] -> [B, L, F].

    One ``take`` per level keeps each gather's source at one level's table
    (32 MB) — measured ~2.5x faster than a single flat gather over the
    concatenated [L*S, F] table (512 MB) on v5e.
    """
    L = rolled.shape[0]
    vals = [jnp.take(rolled[l], base[:, l], axis=0) for l in range(L)]
    return jnp.stack(vals, axis=1)  # [B, L, F]


# Point-chunk size for the forward gather+lerp.  XLA's gather emitter is
# shape-sensitive: at exactly this shape (1024 rays x 192 samples) the 16
# per-level wide-row gathers overlap at ~6 ns/row, while monolithic larger
# shapes fall off a scheduling cliff to ~20 ns/row (measured on v5e,
# docs/batch_scaling_r4.md).  Chunking pins every gather to the known-fast
# shape; scaling is linear in batch again (5.3-6.8 ns/row at 1024-8192
# rays).
_FWD_CHUNK = 196_608


def _interpolate_chunk(x01, rolled, spec: HashGridSpec, n_channels: int):
    B = x01.shape[0]
    L = rolled.shape[0]
    n_corners = 1 << spec.input_dim
    base, frac = base_and_frac(spec, x01)
    w = corner_weights(spec, frac)  # [B, L, K]
    vals = _gather_rolled(rolled, base)  # [B, L, K*C]
    vals_kc = vals.reshape(B, L, n_corners, n_channels).astype(jnp.float32)
    out = jnp.einsum("blk,blkc->blc", w, vals_kc, precision="highest")
    return out.reshape(B, L * n_channels), base, frac, vals


def _interpolate(x01, rolled, spec: HashGridSpec, n_channels: int):
    """Shared forward body: gather wide rows from ``rolled`` + trilerp,
    in ``_FWD_CHUNK``-point chunks (see note above).

    Returns (out [B, L*C], base, frac, vals [B, L, K*C]).
    """
    B = x01.shape[0]
    if B <= _FWD_CHUNK:
        return _interpolate_chunk(x01, rolled, spec, n_channels)
    splits = list(range(_FWD_CHUNK, B, _FWD_CHUNK))
    parts = [
        _interpolate_chunk(c, rolled, spec, n_channels)
        for c in jnp.split(x01, splits)
    ]
    out, base, frac, vals = (jnp.concatenate([p[i] for p in parts])
                             for i in range(4))
    return out, base, frac, vals


def coherent_encode_prebuilt(
    x01: jax.Array, rolled: jax.Array, spec: HashGridSpec
) -> jax.Array:
    """Forward-only encode against a PREBUILT rolled table.

    Eval path: ``render_image`` / ``query_field`` re-enter the encoder per
    ``lax.map`` tile; building the [L, S, K*C] rolled table inside each
    tile (as ``coherent_encode`` does) re-materializes up to 512 MB per
    tile iteration with frozen params.  Build once with
    ``build_rolled_table`` outside the tiling loop and pass it here
    (VERDICT r2 missing #3 / weak #7).  Not differentiable wrt the table.
    """
    C = rolled.shape[-1] >> spec.input_dim
    out, _, _, _ = _interpolate(x01, rolled, spec, C)
    return out


def _forward(x01, table, spec: HashGridSpec, table_dtype):
    L, S, C = table.shape
    rolled = build_rolled_table(table, spec, table_dtype)
    out, base, frac, vals = _interpolate(x01, rolled, spec, C)
    return out, (base, frac, vals)


def _backward(spec: HashGridSpec, table_dtype, backward, shape_LSC, res, g):
    from .bucket_matmul import bucket_grad_matmul
    from .roll_kernels import _PAD, unroll_reduce_fm

    L, S, C = shape_LSC
    D = spec.input_dim
    n_corners = 1 << D
    base, frac, vals = res
    B = base.shape[0]
    g = g.reshape(B, L, C).astype(jnp.float32)

    # ----- grad wrt table: sort + bucket one-hot matmul (no scatter) -----
    # f32 keys (exact < 2^24) + no stability: the f32 unstable sort is
    # ~7x the int32 stable sort's speed on v5e (docs/span_gather_r5.md);
    # tie order only permutes the in-bucket f32 summation order, which
    # stays deterministic for a fixed input.
    keys = base.T.astype(jnp.float32)  # [L, B]
    lanes = [frac[:, :, d].T for d in range(D)] + [g[:, :, c].T for c in range(C)]
    sorted_all = jax.lax.sort((keys, *lanes), dimension=-1, num_keys=1,
                              is_stable=False)
    sk = sorted_all[0]
    sf = jnp.stack(sorted_all[1 : 1 + D], axis=1)  # [L, D, B]
    sg = jnp.stack(sorted_all[1 + D :], axis=1)  # [L, C, B]

    # Rolled-layout gradient (k-major rows), wrap-extended so the Pallas
    # unroll-reduce streams it straight back to canonical space — the XLA
    # adjoint corner rolls this replaced measured 9.5-17 ms
    # (docs/profile_r3.md A5, VERDICT r4 next-#2).
    grad_rolled = bucket_grad_matmul(
        sk, sf, sg, table_size=S, input_dim=D, out_dtype=table_dtype,
        extend_cols=_PAD,
    )  # [L, K*C, S+_PAD]
    grad_table = unroll_reduce_fm(grad_rolled, spec, C)  # [L, S, C]

    # ----- grad wrt x01: analytic through the trilinear weights ---------
    vals_kc = vals.reshape(B, L, n_corners, C).astype(jnp.float32)
    dwdf = corner_weight_grads(spec, frac)  # [B, L, K, D]
    # dout[c]/df[d] = sum_k dw_k/df_d * val[k, c]
    gv = jnp.einsum("blc,blkc->blk", g, vals_kc, precision="highest")  # [B, L, K]
    grad_frac = jnp.einsum("blk,blkd->bld", gv, dwdf, precision="highest")  # [B, L, D]
    scales = jnp.asarray(spec.scales)  # [L]
    grad_x01 = jnp.sum(grad_frac * scales[None, :, None], axis=1)  # [B, D]

    return grad_x01.astype(jnp.float32), grad_table.astype(jnp.float32)


def coherent_encode_takevjp(
    x01: jax.Array, table: jax.Array, spec: HashGridSpec, table_dtype=jnp.float32
) -> jax.Array:
    """Rolled-table forward with plain autodiff backward (no Pallas).

    Same forward as ``coherent_encode`` but built from differentiable ops
    only, so the backward is XLA's VJP chain: einsum-grad -> ``jnp.take``
    scatter-add of the 3.1M *wide* rows (one per (point, level), ~10x fewer
    than the narrow path) -> static-roll adjoints.  Slower than the bucket
    kernel but entirely XLA — the conservative fallback path.
    """
    out, _ = _forward(x01, table, spec, table_dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def coherent_encode(
    x01: jax.Array, table: jax.Array, spec: HashGridSpec,
    table_dtype=jnp.float32, backward: str = "bucket",
) -> jax.Array:
    """Fast coherent hash encoding: [B, D] in [0,1] -> [B, L*C].

    Forward: rolled-table wide-row gather (the r4 fast path; the r5
    default is the sorted span-gather in ``ops/span_gather.py``, which
    this remains the input-gradient-capable alternative to).  Backward:
    deterministic sort + MXU bucket-matmul (table grad, reduced to
    canonical layout by the Pallas unroll kernel) + analytic trilinear
    (input grad).  ``backward`` is kept for API stability; "bucket" is
    the only kernel (the "canonical" variant was removed in r5 —
    docs/profile_r3.md A4b).  Numerics match
    ``coherent_encode_reference`` to the rolled-table dtype.
    """
    out, _ = _forward(x01, table, spec, table_dtype)
    return out


def _fwd(x01, table, spec, table_dtype, backward):
    out, res = _forward(x01, table, spec, table_dtype)
    return out, (res, table.shape)


def _bwd(spec, table_dtype, backward, carry, g):
    res, shape_LSC = carry
    return _backward(spec, table_dtype, backward, shape_LSC, res, g)


coherent_encode.defvjp(_fwd, _bwd)
