"""Depth sampling along rays: stratified uniform + inverse-CDF (hierarchical).

Matches the reference sampling semantics (``/root/reference/src/render/render.py``):
- uniform ``z = near*(1-t) + far*t`` over ``n_samples`` (render.py:91-93)
- optional stratified perturbation within bins (render.py:95-100)
- ``sample_pdf``: inverse-CDF sampling for the hierarchical fine pass
  (render.py:215-246), implemented with ``jnp.searchsorted``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(near, far, n_samples: int, perturb: bool, key=None):
    """Depth values [.., n_samples] along rays.

    ``near``/``far`` are [..., 1] (per-ray); with ``perturb`` a uniform
    jitter within each bin is applied (requires ``key``).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z = near * (1.0 - t) + far * t  # broadcast -> [..., n_samples]

    if perturb:
        if key is None:
            raise ValueError("perturb=True requires a PRNG key")
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * t_rand
    return z


def sample_pdf(bins, weights, n_samples: int, det: bool = False, key=None):
    """Inverse-CDF sampling of ``n_samples`` new depths from a piecewise pdf.

    bins: [..., M] bin edges (z midpoints); weights: [..., M-1].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., M]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        if key is None:
            raise ValueError("det=False requires a PRNG key")
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples)
    ).reshape(u.shape)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
