"""Beer-Lambert line integration along rays (attenuation, no exponentiation).

Matches the reference ``raw2outputs`` (``/root/reference/src/render/render.py:178-212``):
``acc = sum((sigma + noise) * dt * |d|)`` with the last interval padded to
1e-10, plus the fine-pass sampling weights (normalized |Delta sigma|
between adjacent samples for ``out_dim == 1``, or channel 2 directly for
``out_dim == 2``).  A pure associative reduction -> trivially shardable
over the sample axis via ``psum`` of partial sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(raw, z_vals, rays_d, raw_noise_std: float = 0.0, key=None):
    """raw: [n_rays, n_samples, C]; z_vals: [n_rays, n_samples]; rays_d: [n_rays, 3].

    Returns (acc [n_rays], weights [n_rays, n_samples]).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e-10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    sigma = raw[..., 0]
    if raw_noise_std > 0.0:
        if key is None:
            raise ValueError("raw_noise_std > 0 requires a PRNG key")
        sigma = sigma + jax.random.normal(key, sigma.shape, sigma.dtype) * raw_noise_std

    acc = jnp.sum(sigma * dists, axis=-1)

    if raw.shape[-1] == 1:
        eps = jnp.full_like(raw[:, :1, -1], 1e-10)
        weights = jnp.concatenate(
            [eps, jnp.abs(raw[:, 1:, -1] - raw[:, :-1, -1])], axis=-1
        )
        weights = weights / jnp.max(weights)
    elif raw.shape[-1] == 2:
        weights = raw[..., 1] / jnp.max(raw[..., 1])
    else:
        raise NotImplementedError("raw last dim must be 1 or 2")

    return acc, weights
