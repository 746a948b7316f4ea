"""Model layer tests: encoder factory, frequency encoder, density MLP."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu.models import (
    get_encoder,
    get_network,
)
from neuralvolumetricreconstructionformedicalimages_tpu.models.encoders import (
    FreqEncoderSpec,
    HashEncoderSpec,
    IdentityEncoderSpec,
)


def reference_mlp_spec(**over):
    enc = get_encoder("hashgrid", input_dim=3, num_levels=4, level_dim=2,
                      base_resolution=4, log2_hashmap_size=10)
    kw = dict(encoder=enc, bound=0.3, num_layers=4, hidden_dim=32,
              skips=(2,), out_dim=1, last_activation="sigmoid")
    kw.update(over)
    return get_network("mlp")(**kw)


def test_factories():
    assert isinstance(get_encoder("None"), IdentityEncoderSpec)
    assert isinstance(get_encoder("frequency", multires=6), FreqEncoderSpec)
    assert isinstance(get_encoder("hashgrid"), HashEncoderSpec)
    with pytest.raises(NotImplementedError):
        get_encoder("nope")
    with pytest.raises(NotImplementedError):
        get_network("nope")


def test_layer_dims_match_reference_construction():
    """num_layers=4, hidden 32, skips=(2,): layer 2 sees hidden+in_dim
    (network.py:16-19, skip-concat before linear i at network.py:45-48)."""
    spec = reference_mlp_spec()
    in_dim = spec.encoder.output_dim  # 4 levels * 2 = 8
    assert spec.layer_dims == [(in_dim, 32), (32, 32), (32 + in_dim, 32), (32, 1)]


def test_forward_shapes_and_sigmoid_range():
    spec = reference_mlp_spec()
    params = spec.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (37, 3), minval=-0.3, maxval=0.3)
    y = spec.apply(params, x)
    assert y.shape == (37, 1)
    assert (np.asarray(y) > 0).all() and (np.asarray(y) < 1).all()
    # arbitrary leading dims
    y2 = spec.apply(params, x.reshape(37, 1, 3))
    np.testing.assert_allclose(np.asarray(y2).reshape(37, 1), np.asarray(y), atol=1e-6)


@pytest.mark.parametrize("act,check", [
    ("tanh", lambda y: (np.abs(y) < 1).all()),
    ("none", lambda y: True),
    ("relu", lambda y: True),
])
def test_last_activations(act, check):
    spec = reference_mlp_spec(last_activation=act)
    params = spec.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (8, 3), minval=-0.3, maxval=0.3)
    y = np.asarray(spec.apply(params, x))
    assert check(y)


def test_init_distribution_matches_torch_linear():
    """W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    spec = reference_mlp_spec(hidden_dim=64)
    params = spec.init(jax.random.key(0))
    for (fan_in, fan_out), layer in zip(spec.layer_dims, params["layers"]):
        bound = 1.0 / np.sqrt(fan_in)
        w = np.asarray(layer["w"])
        assert w.shape == (fan_in, fan_out)
        assert np.abs(w).max() <= bound
        assert np.abs(np.asarray(layer["b"])).max() <= bound


def test_freq_encoder():
    enc = get_encoder("frequency", input_dim=3, multires=6)
    assert enc.output_dim == 3 + 3 * 6 * 2
    x = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    y = np.asarray(enc.apply({}, x, bound=1.0))
    assert y.shape == (1, enc.output_dim)
    np.testing.assert_allclose(y[0, :3], [0.1, -0.2, 0.3], atol=1e-6)
    # first band freq = 2^0 = 1 -> sin(x), cos(x)
    np.testing.assert_allclose(y[0, 3:6], np.sin([0.1, -0.2, 0.3]), atol=1e-6)
    np.testing.assert_allclose(y[0, 6:9], np.cos([0.1, -0.2, 0.3]), atol=1e-6)
    # log-spaced bands 2^0 .. 2^(multires-1)
    np.testing.assert_allclose(enc.freq_bands, 2.0 ** np.linspace(0, 5, 6))


def test_hash_encoder_bound_mapping():
    """[-bound, bound] -> [0, 1] affine map + clamping."""
    enc = get_encoder("hashgrid", num_levels=2, level_dim=2,
                      base_resolution=4, log2_hashmap_size=10)
    params = enc.init(jax.random.key(0))
    x_in = jnp.asarray([[0.3, 0.3, 0.3]], jnp.float32)    # maps to 1.0 at bound .3
    x_out = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)   # beyond bound: clamped
    y1 = enc.apply(params, x_in, bound=0.3)
    y2 = enc.apply(params, x_out, bound=0.3)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-7)


def test_jit_and_grad_through_full_model():
    spec = reference_mlp_spec()
    params = spec.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (64, 3), minval=-0.29, maxval=0.29)

    @jax.jit
    def loss(p):
        return (spec.apply(p, x) ** 2).sum()

    g = jax.grad(loss)(params)
    gn = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(lambda t: float(jnp.abs(t).sum()), g))
    assert np.isfinite(gn) and gn > 0


def test_invalid_backward_and_table_dtype_raise():
    with pytest.raises(ValueError, match="backward"):
        get_encoder("hashgrid", backward="takevjp")
    with pytest.raises(ValueError, match="table_dtype"):
        get_encoder("hashgrid", table_dtype="fp8")


def test_take_backward_allowed_for_any_table_size(rng):
    """The pure-XLA take path has no bucket-tiling constraint; a table not
    divisible by 2048 must still use the rolled fast path (ADVICE r2)."""
    enc = get_encoder("hashgrid", num_levels=3, base_resolution=4,
                      log2_hashmap_size=8, backward="take")
    assert enc.grid.table_size % 2048 != 0
    params = enc.init(jax.random.key(0))
    x = jnp.asarray(rng.uniform(-0.2, 0.2, (33, 3)).astype(np.float32))
    out = enc.apply(params, x, 0.2)
    ref_enc = dataclasses.replace(enc, fast=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_enc.apply(params, x, 0.2)), atol=1e-6)


def test_freeze_prebuilds_rolled_and_matches(rng):
    spec = reference_mlp_spec()
    params = spec.init(jax.random.key(2))
    frozen = spec.freeze(params)
    assert "rolled" in frozen["encoder"]
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (64, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spec.apply(frozen, x)),
        np.asarray(spec.apply(params, x)), atol=1e-6)


def test_bfloat16_compute_dtype_close(rng):
    spec = reference_mlp_spec()
    spec_bf = reference_mlp_spec(compute_dtype="bfloat16")
    params = spec.init(jax.random.key(3))
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (64, 3)).astype(np.float32))
    y32, ybf = spec.apply(params, x), spec_bf.apply(params, x)
    assert ybf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y32), np.asarray(ybf), atol=2e-2)
