"""Hash-grid encoding tests against a slow pure-Python oracle.

The oracle transcribes the documented index math of the reference CUDA
kernel (hashencoder.cu:36-74 dense-until-overflow + XOR-prime hash;
:99-111 scale/position; :118-143 corner interpolation) independently of
the vectorized implementation under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu.ops.hash_encoding import (
    HashGridSpec,
    hash_encode,
    hash_grid_indices,
)

PRIMES = (1, 19349663, 83492791)


def oracle_index(pos_grid, resolution, hashmap_size):
    """Reference index semantics for one corner (pure Python ints)."""
    D = len(pos_grid)
    stride = 1
    index = 0
    for d in range(D):
        if stride > hashmap_size:
            break
        index += int(pos_grid[d]) * stride
        stride *= resolution + 1
    if stride > hashmap_size:
        index = 0
        for d in range(D):
            index ^= (int(pos_grid[d]) * PRIMES[d]) & 0xFFFFFFFF
            index &= 0xFFFFFFFF
    return index % hashmap_size


def oracle_encode(spec: HashGridSpec, table, x01):
    """Slow per-point/level/corner oracle."""
    D, L, C = spec.input_dim, spec.num_levels, spec.level_dim
    B = x01.shape[0]
    out = np.zeros((B, L, C), np.float64)
    for b in range(B):
        for lvl in range(L):
            scale = float(spec.scales[lvl])
            res = int(spec.resolutions[lvl])
            size = int(spec.level_sizes[lvl])
            pos = x01[b] * scale + 0.5
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            for corner in range(1 << D):
                w = 1.0
                pl = []
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        pl.append(pg[d] + 1)
                    else:
                        w *= 1 - frac[d]
                        pl.append(pg[d])
                idx = oracle_index(pl, res, size)
                out[b, lvl] += w * np.asarray(table[lvl, idx], np.float64)
    return out.reshape(B, L * C)


SMALL = HashGridSpec(input_dim=3, num_levels=6, level_dim=2,
                     base_resolution=4, log2_hashmap_size=10)


def test_level_sizes_formula():
    spec = HashGridSpec()  # reference default: 16 levels, base 16, 2^19
    res = 16 * 2 ** np.arange(16)
    # reference scale 2^l*H-1 => resolution ceil(scale)+1 == 16*2^l
    np.testing.assert_array_equal(spec.resolutions, res)
    want = np.minimum((res + 1) ** 3, 2**19)
    np.testing.assert_array_equal(spec.level_sizes, want)
    # live param count matches hashgrid.py:104 semantics
    assert spec.n_params == int(want.sum()) * 2
    # dense exactly when (res+1)^3 <= 2^19 (levels 0..2)
    np.testing.assert_array_equal(spec.dense_levels, (res + 1) ** 3 <= 2**19)


def test_indices_match_oracle():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    idx, w = hash_grid_indices(SMALL, jnp.asarray(x))
    idx, w = np.asarray(idx), np.asarray(w)
    for b in range(0, 32, 7):
        for lvl in range(SMALL.num_levels):
            scale = float(SMALL.scales[lvl])
            res = int(SMALL.resolutions[lvl])
            size = int(SMALL.level_sizes[lvl])
            pos = x[b] * scale + 0.5
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            for corner in range(8):
                pl = [pg[d] + ((corner >> d) & 1) for d in range(3)]
                want = oracle_index(pl, res, size)
                assert idx[b, lvl, corner] == want, (b, lvl, corner)
                w_want = np.prod([
                    frac[d] if (corner >> d) & 1 else 1 - frac[d] for d in range(3)
                ])
                assert np.isclose(w[b, lvl, corner], w_want, atol=1e-5)


def test_encode_matches_oracle():
    rng = np.random.default_rng(5)
    key = jax.random.key(0)
    table = SMALL.init(key)
    x = rng.uniform(0.01, 0.99, (16, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(x), table, SMALL))
    want = oracle_encode(SMALL, np.asarray(table), x)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_weights_partition_of_unity():
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (64, 3)), jnp.float32)
    _, w = hash_grid_indices(SMALL, x)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)


def test_encode_exact_at_grid_corner():
    """A point exactly on a grid vertex reads that vertex's entry."""
    spec = HashGridSpec(input_dim=3, num_levels=1, level_dim=2,
                        base_resolution=4, log2_hashmap_size=10)
    table = spec.init(jax.random.key(2))
    # level 0: scale = 3 -> pos = x*3 + .5 ; choose x so pos integer: x = 0.5 -> pos = 2.0
    x = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    out = np.asarray(hash_encode(x, table, spec))
    res = int(spec.resolutions[0])
    idx = 2 + 2 * (res + 1) + 2 * (res + 1) ** 2
    np.testing.assert_allclose(out[0], np.asarray(table)[0, idx], atol=1e-7)


def test_gradient_is_scattered_weights():
    """d(sum(out))/d(table) puts exactly the interp weights at corner slots."""
    spec = HashGridSpec(input_dim=3, num_levels=2, level_dim=1,
                        base_resolution=4, log2_hashmap_size=12)
    table = spec.init(jax.random.key(4))
    x = jnp.asarray([[0.3, 0.6, 0.1]], jnp.float32)

    g = jax.grad(lambda t: hash_encode(x, t, spec).sum())(table)
    g = np.asarray(g)
    idx, w = hash_grid_indices(spec, x)
    idx, w = np.asarray(idx), np.asarray(w)
    want = np.zeros_like(g)
    for lvl in range(2):
        for corner in range(8):
            want[lvl, idx[0, lvl, corner], 0] += w[0, lvl, corner]
    np.testing.assert_allclose(g, want, atol=1e-6)


def test_grad_deterministic():
    """Deterministic scatter-add: identical grads across runs (upgrade over
    the reference's CUDA atomicAdd nondeterminism, hashencoder.cu:253-270)."""
    table = SMALL.init(jax.random.key(7))
    x = jax.random.uniform(jax.random.key(8), (512, 3))
    f = jax.jit(lambda t: (hash_encode(x, t, SMALL) ** 2).sum())
    g1 = jax.grad(f)(table)
    g2 = jax.grad(f)(table)
    assert (np.asarray(g1) == np.asarray(g2)).all()


class TestFastXorBackward:
    """hash_encode_fast: scatter-free XOR backward (sort + bucket kernel on
    the corner-expanded stream) must match the autodiff oracle exactly."""

    SPEC11 = HashGridSpec(num_levels=6, base_resolution=4, log2_hashmap_size=11)

    def _pair(self, x01, rng):
        from neuralvolumetricreconstructionformedicalimages_tpu.ops.hash_encoding import (
            hash_encode_fast)

        table = self.SPEC11.init(jax.random.key(1))
        ct = jnp.asarray(
            rng.normal(size=(x01.shape[0], self.SPEC11.output_dim)).astype(np.float32))

        def loss(fn):
            return lambda x, t: jnp.vdot(fn(x, t, self.SPEC11), ct)

        out_r = hash_encode(x01, table, self.SPEC11)
        out_f = hash_encode_fast(x01, table, self.SPEC11)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_f), atol=1e-7)

        gx_r, gt_r = jax.grad(loss(hash_encode), (0, 1))(x01, table)
        gx_f, gt_f = jax.grad(loss(hash_encode_fast), (0, 1))(x01, table)
        np.testing.assert_allclose(np.asarray(gt_r), np.asarray(gt_f), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_f),
                                   rtol=2e-4, atol=2e-4)

    def test_uniform_points(self, rng):
        x01 = jnp.asarray(rng.uniform(0, 1, (257, 3)).astype(np.float32))
        self._pair(x01, rng)

    def test_duplicate_heavy_points(self, rng):
        x01 = jnp.asarray(
            np.repeat(rng.uniform(0, 1, (4, 3)).astype(np.float32), 80, axis=0))
        self._pair(x01, rng)

    def test_encoder_dispatch_uses_fast_xor(self, rng):
        from neuralvolumetricreconstructionformedicalimages_tpu.models.encoders import (
            get_encoder)

        enc_fast = get_encoder("hashgrid", num_levels=6, base_resolution=4,
                               log2_hashmap_size=11, hash_variant="xor", fast=True)
        enc_ref = get_encoder("hashgrid", num_levels=6, base_resolution=4,
                              log2_hashmap_size=11, hash_variant="xor", fast=False)
        params = enc_fast.init(jax.random.key(0))
        x = jnp.asarray(rng.uniform(-0.29, 0.29, (100, 3)).astype(np.float32))

        def loss(enc):
            return lambda p: jnp.sum(enc.apply(p, x, 0.3) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss(enc_fast))(params)["table"]),
            np.asarray(jax.grad(loss(enc_ref))(params)["table"]), atol=2e-5)
