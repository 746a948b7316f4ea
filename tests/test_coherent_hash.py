"""Coherent (linear) hash encoding: oracle semantics + fast-path equivalence.

The fast path (rolled-table gather forward, sort + Pallas bucket-matmul
backward) must match the pure-jnp oracle bit-closely in both outputs and
gradients; the Pallas kernel runs in interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu.ops.bucket_matmul import (
    bucket_grad_matmul,
    bucket_grad_matmul_reference,
)
from neuralvolumetricreconstructionformedicalimages_tpu.ops.coherent_hash import (
    base_and_frac,
    coherent_encode,
    coherent_encode_reference,
    coherent_encode_takevjp,
    corner_offsets,
    corner_weights,
    multipliers,
)
from neuralvolumetricreconstructionformedicalimages_tpu.ops.hash_encoding import (
    HashGridSpec,
    hash_encode,
    hash_grid_indices,
)

SPEC = HashGridSpec(num_levels=6, base_resolution=4, log2_hashmap_size=11)


def _points(rng, n=257):
    return jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))


class TestCoherentSemantics:
    def test_dense_levels_match_xor_variant(self, rng):
        """Dense levels index identically to the reference dense layout, so
        the coherent and XOR variants agree exactly there."""
        x01 = _points(rng)
        idx_xor, w_xor = hash_grid_indices(SPEC, x01)
        base, frac = base_and_frac(SPEC, x01)
        offs = jnp.asarray(corner_offsets(SPEC))
        idx_coh = (base[:, :, None] + offs[None]) & (SPEC.table_size - 1)
        w_coh = corner_weights(SPEC, frac)
        dense = SPEC.dense_levels
        np.testing.assert_array_equal(
            np.asarray(idx_xor)[:, dense, :], np.asarray(idx_coh)[:, dense, :]
        )
        np.testing.assert_allclose(
            np.asarray(w_xor), np.asarray(w_coh), rtol=0, atol=1e-6
        )

    def test_fully_dense_spec_equals_xor_encode(self, rng):
        """With every level dense the two variants are the same function."""
        spec = HashGridSpec(num_levels=3, base_resolution=2, log2_hashmap_size=11)
        assert spec.dense_levels.all()
        x01 = _points(rng)
        table = spec.init(jax.random.key(0))
        np.testing.assert_allclose(
            np.asarray(hash_encode(x01, table, spec)),
            np.asarray(coherent_encode_reference(x01, table, spec)),
            rtol=0,
            atol=1e-6,
        )

    def test_multipliers_dense_are_strides(self):
        m = multipliers(SPEC)
        res_p1 = SPEC.resolutions + 1
        for l in range(SPEC.num_levels):
            if SPEC.dense_levels[l]:
                assert tuple(m[l]) == (1, res_p1[l], res_p1[l] ** 2)

    def test_indices_in_range(self, rng):
        base, _ = base_and_frac(SPEC, _points(rng))
        offs = corner_offsets(SPEC)
        idx = (np.asarray(base)[:, :, None] + offs[None]) & (SPEC.table_size - 1)
        assert idx.min() >= 0 and idx.max() < SPEC.table_size


class TestFastPathEquivalence:
    def test_forward_matches_oracle(self, rng):
        x01 = _points(rng, 333)
        table = SPEC.init(jax.random.key(1))
        ref = coherent_encode_reference(x01, table, SPEC)
        fast = coherent_encode(x01, table, SPEC)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-6)

    def test_grads_match_oracle(self, rng):
        x01 = _points(rng, 333)
        table = SPEC.init(jax.random.key(1))
        ct = jnp.asarray(rng.normal(size=(333, SPEC.output_dim)).astype(np.float32))

        def loss(fn):
            return lambda x, t: jnp.vdot(fn(x, t, SPEC), ct)

        gx_r, gt_r = jax.grad(loss(coherent_encode_reference), (0, 1))(x01, table)
        gx_f, gt_f = jax.grad(loss(coherent_encode), (0, 1))(x01, table)
        np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_f), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_f), atol=1e-5)

    def test_takevjp_fallback_matches_oracle(self, rng):
        """The pure-XLA fallback backward (autodiff through the rolled
        gather) is numerically the same encoder as the bucket-kernel path."""
        x01 = _points(rng, 333)
        table = SPEC.init(jax.random.key(1))
        ct = jnp.asarray(rng.normal(size=(333, SPEC.output_dim)).astype(np.float32))

        ref = coherent_encode_reference(x01, table, SPEC)
        fast = coherent_encode_takevjp(x01, table, SPEC)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-6)

        def loss(fn):
            return lambda x, t: jnp.vdot(fn(x, t, SPEC), ct)

        gx_r, gt_r = jax.grad(loss(coherent_encode_reference), (0, 1))(x01, table)
        gx_f, gt_f = jax.grad(loss(coherent_encode_takevjp), (0, 1))(x01, table)
        np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_f), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_f), atol=1e-5)

    def test_duplicate_heavy_points(self, rng):
        """Many identical points stress-test skewed buckets in the backward
        (dynamic chunk loop, no MAXLEN truncation)."""
        x01 = jnp.concatenate(
            [jnp.full((500, 3), 0.375, jnp.float32), _points(rng, 12)]
        )
        table = SPEC.init(jax.random.key(2))
        ct = jnp.asarray(rng.normal(size=(512, SPEC.output_dim)).astype(np.float32))

        def loss(fn):
            return lambda t: jnp.vdot(fn(x01, t, SPEC), ct)

        gt_r = jax.grad(loss(coherent_encode_reference))(table)
        gt_f = jax.grad(loss(coherent_encode))(table)
        np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_f), atol=3e-4)

    def test_jit_and_vmap(self, rng):
        x01 = _points(rng, 64)
        table = SPEC.init(jax.random.key(3))
        out = jax.jit(lambda x, t: coherent_encode(x, t, SPEC))(x01, table)
        assert out.shape == (64, SPEC.output_dim)


class TestBucketKernel:
    def _check(self, keys_np, rng, L=2, B=1024, S=1 << 12):
        frac = jnp.asarray(rng.uniform(0, 1, (L, 3, B)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(L, 2, B)).astype(np.float32))
        keys = jnp.asarray(np.sort(keys_np, axis=-1))
        out = bucket_grad_matmul(keys, frac, g, table_size=S, input_dim=3)
        ref = bucket_grad_matmul_reference(keys, frac, g, table_size=S, input_dim=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_uniform_random_keys(self, rng):
        self._check(rng.integers(0, 1 << 12, (2, 1024)).astype(np.int32), rng)

    def test_single_bucket_skew(self, rng):
        self._check(rng.integers(100, 120, (2, 1024)).astype(np.int32), rng)

    def test_boundary_keys(self, rng):
        keys = np.concatenate(
            [
                np.zeros((2, 10), np.int32),
                np.full((2, 10), 2047, np.int32),
                np.full((2, 10), 2048, np.int32),
                np.full((2, 994), (1 << 12) - 1, np.int32),
            ],
            axis=-1,
        )
        self._check(keys, rng)

    def test_empty_levels(self, rng):
        """All keys at one index; other buckets must come out zero."""
        keys = np.full((2, 1024), 5, np.int32)
        self._check(keys, rng)


class TestPrebuiltAndDtype:
    def test_prebuilt_matches_oracle(self, rng):
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.coherent_hash import (
            build_rolled_table,
            coherent_encode_prebuilt,
        )

        x01 = _points(rng, 211)
        table = SPEC.init(jax.random.key(4))
        rolled = build_rolled_table(table, SPEC)
        out = coherent_encode_prebuilt(x01, rolled, SPEC)
        ref = coherent_encode_reference(x01, table, SPEC)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_rolled_table_layout(self, rng):
        """rolled[l, i, k*C + c] == table[l, (i + off[l,k]) % S, c]."""
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.coherent_hash import (
            build_rolled_table,
        )

        table = SPEC.init(jax.random.key(5))
        rolled = np.asarray(build_rolled_table(table, SPEC))
        tab = np.asarray(table)
        offs = corner_offsets(SPEC)
        L, S, C = tab.shape
        for l in (0, SPEC.num_levels - 1):
            for k in (0, 3, 7):
                np.testing.assert_array_equal(
                    rolled[l, :, k * C : (k + 1) * C],
                    np.roll(tab[l], -int(offs[l, k]), axis=0),
                )

    def test_bfloat16_rolled_close_to_f32(self, rng):
        x01 = _points(rng, 211)
        table = SPEC.init(jax.random.key(6))
        f32 = coherent_encode(x01, table, SPEC)
        bf16 = coherent_encode(x01, table, SPEC, jnp.bfloat16)
        assert bf16.dtype == jnp.float32  # output upcast
        np.testing.assert_allclose(
            np.asarray(f32), np.asarray(bf16), atol=2e-2, rtol=2e-2
        )


SPEC14 = HashGridSpec(num_levels=5, base_resolution=4, log2_hashmap_size=14)


class TestSortedForward:
    """The sorted span-gather forward (ops/span_gather.py) and the Pallas
    corner-roll kernels (ops/roll_kernels.py) must match the pure-jnp
    oracle bit-for-bit (unpacked) / to quantization (packed).

    The 'canonical-target' backward kernel these tests used to cover was
    removed in r5 (2.7x slower than the bucket path, docs/profile_r3.md
    A4b); its role — skipping the adjoint rolls — is now filled by the
    unroll-reduce kernel tested here.
    """

    def test_forward_matches_oracle(self, rng):
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.span_gather import (
            sorted_encode)

        x01 = _points(rng, 1500)  # non-multiple of the 1024 chunk
        table = SPEC14.init(jax.random.key(1))
        ref = coherent_encode_reference(x01, table, SPEC14)
        out = sorted_encode(x01, table, SPEC14, jnp.float32, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_packed_forward_close(self, rng):
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.span_gather import (
            sorted_encode)

        x01 = _points(rng, 700)
        table = SPEC14.init(jax.random.key(1))
        ref = coherent_encode_reference(x01, table, SPEC14)
        out = sorted_encode(x01, table, SPEC14, jnp.float32, True)
        scale = float(np.abs(np.asarray(ref)).max())
        assert float(np.abs(np.asarray(out - ref)).max()) < 0.02 * scale + 1e-4

    def test_table_grads_match_oracle(self, rng):
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.span_gather import (
            sorted_encode)

        x01 = jnp.concatenate(
            [jnp.full((700, 3), 0.625, jnp.float32), _points(rng, 68)])
        table = SPEC14.init(jax.random.key(1))
        ct = jnp.asarray(
            rng.normal(size=(x01.shape[0], SPEC14.output_dim)).astype(np.float32))
        gt_r = jax.grad(
            lambda t: jnp.vdot(coherent_encode_reference(x01, t, SPEC14), ct)
        )(table)
        gt_s = jax.grad(
            lambda t: jnp.vdot(sorted_encode(x01, t, SPEC14, jnp.float32, False), ct)
        )(table)
        np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_s), atol=3e-4)

    def test_roll_kernels_match_references(self, rng):
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.roll_kernels import (
            _PAD, roll_broadcast_fm, unroll_reduce_fm, wrap_extend)
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.span_gather import (
            roll_broadcast_reference, unroll_reduce_reference)

        # S = 2^14 exercises the Pallas kernels; the fm layout is k-major.
        table = SPEC14.init(jax.random.key(2))
        R = roll_broadcast_fm(table, SPEC14)
        R_ref = roll_broadcast_reference(table, SPEC14)
        np.testing.assert_array_equal(np.asarray(R), np.asarray(R_ref))

        L, S, C = table.shape
        G = jnp.asarray(rng.normal(size=(L, 8 * C, S)).astype(np.float32))
        U = unroll_reduce_fm(wrap_extend(G, _PAD), SPEC14, C)
        U_ref = unroll_reduce_reference(G, SPEC14)
        np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), atol=1e-4)

    def test_encoder_spec_dispatch(self, rng):
        """forward='sorted' (the default) must produce the oracle features
        through the HashEncoderSpec.apply dispatch."""
        from neuralvolumetricreconstructionformedicalimages_tpu.models.encoders import (
            HashEncoderSpec)

        enc = HashEncoderSpec(grid=SPEC14, forward="sorted", pack_sort=False)
        params = enc.init(jax.random.key(0))
        x = jnp.asarray(rng.uniform(-0.2, 0.2, (97, 3)).astype(np.float32))
        out = enc.apply(params, x, 0.2)
        ref = HashEncoderSpec(grid=SPEC14, fast=False).apply(params, x, 0.2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("level_dim,input_dim", [(1, 3), (4, 3), (2, 2)])
def test_kernel_channel_and_dim_variants(rng, level_dim, input_dim):
    """The reference dispatches C in {1,2,4,8} and D in {2,3}
    (hashencoder.cu:301-369); both bucket kernels must handle them."""
    spec = HashGridSpec(num_levels=4, base_resolution=4, level_dim=level_dim,
                        input_dim=input_dim, log2_hashmap_size=14)
    table = spec.init(jax.random.key(1))
    x01 = jnp.asarray(rng.uniform(0, 1, (217, input_dim)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(217, spec.output_dim)).astype(np.float32))

    def loss(fn, *extra):
        return lambda t: jnp.vdot(fn(x01, t, spec, *extra), ct)

    gt_ref = jax.grad(loss(coherent_encode_reference))(table)
    gt = jax.grad(loss(coherent_encode, jnp.float32, "bucket"))(table)
    np.testing.assert_allclose(
        np.asarray(gt_ref), np.asarray(gt), atol=2e-5)


class TestBf16GradientPath:
    """With a bf16 gather table the backward emits the rolled gradient in
    bf16 (half the table-shaped fixed traffic); only the per-(corner,
    entry) bucket sums round — cross-corner accumulation stays f32."""

    def test_bucket_kernel_bf16_output_close_to_reference(self, rng):
        L, B, S = 2, 1024, 1 << 12
        keys = jnp.asarray(
            np.sort(rng.integers(0, S, (L, B)).astype(np.int32), axis=-1))
        frac = jnp.asarray(rng.uniform(0, 1, (L, 3, B)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(L, 2, B)).astype(np.float32))
        out = bucket_grad_matmul(keys, frac, g, table_size=S, input_dim=3,
                                 out_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
        ref = bucket_grad_matmul_reference(keys, frac, g, table_size=S,
                                           input_dim=3)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=5e-2, rtol=1e-2)

    def test_table_grads_bf16_close_to_f32(self, rng):
        x01 = _points(rng, 333)
        table = SPEC.init(jax.random.key(1))
        ct = jnp.asarray(rng.normal(size=(333, SPEC.output_dim)).astype(np.float32))

        def loss(dtype):
            return lambda x, t: jnp.vdot(coherent_encode(x, t, SPEC, dtype), ct)

        gx32, gt32 = jax.grad(loss(jnp.float32), (0, 1))(x01, table)
        gx16, gt16 = jax.grad(loss(jnp.bfloat16), (0, 1))(x01, table)
        assert gt16.dtype == jnp.float32  # canonical gradient stays f32
        scale = float(np.abs(np.asarray(gt32)).max())
        np.testing.assert_allclose(np.asarray(gt16), np.asarray(gt32),
                                   atol=2e-2 * scale, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(gx16), np.asarray(gx32),
                                   atol=5e-2, rtol=5e-2)


def test_forward_chunking_matches_monolithic(rng, monkeypatch):
    """The _FWD_CHUNK point-chunked forward (gather-emitter cliff
    workaround) is numerically identical to the monolithic path,
    including a ragged final chunk, and through the custom-vjp grads."""
    from neuralvolumetricreconstructionformedicalimages_tpu.ops import coherent_hash as CH

    x01 = _points(rng, 333)
    table = SPEC.init(jax.random.key(1))
    ref = coherent_encode_reference(x01, table, SPEC)
    monkeypatch.setattr(CH, "_FWD_CHUNK", 100)  # 333 -> chunks 100,100,100,33
    fast = coherent_encode(x01, table, SPEC)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-6)

    ct = jnp.asarray(rng.normal(size=(333, SPEC.output_dim)).astype(np.float32))

    def loss(fn):
        return lambda x, t: jnp.vdot(fn(x, t, SPEC), ct)

    gx_r, gt_r = jax.grad(loss(coherent_encode_reference), (0, 1))(x01, table)
    gx_f, gt_f = jax.grad(loss(coherent_encode), (0, 1))(x01, table)
    np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_f), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_f), atol=1e-5)
