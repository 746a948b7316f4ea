"""Density field: encoder + skip-connection MLP over attenuation.

Architecture parity with the reference ``DensityNetwork``
(``/root/reference/src/network/network.py:5-58``):

- ``num_layers`` linear layers, LeakyReLU(0.01) between them
- the *encoded input* is re-concatenated before each layer listed in
  ``skips`` (network.py:45-46)
- configurable final activation: sigmoid / (leaky)relu / tanh / none
- parameter init mirrors ``torch.nn.Linear`` default
  (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b) so the two frameworks
  start from the same distribution.

The whole field is a pure function ``apply(params, x)``; gradients,
vmapping, sharding and remat all come from JAX transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .encoders import EncoderSpec


_LEAKY_SLOPE = 0.01  # torch.nn.LeakyReLU default


def _last_activation(name: str):
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "relu":  # reference maps "relu" to LeakyReLU (network.py:26)
        return lambda x: jax.nn.leaky_relu(x, _LEAKY_SLOPE)
    if name == "tanh":
        return jnp.tanh
    if name == "none":
        return lambda x: x
    raise NotImplementedError(f"Unknown last activation {name!r}")


@dataclasses.dataclass(frozen=True)
class DensityFieldSpec:
    """Static model configuration (hashable -> jit static argument)."""

    encoder: EncoderSpec
    bound: float = 0.2
    num_layers: int = 8
    hidden_dim: int = 256
    skips: Tuple[int, ...] = (4,)
    out_dim: int = 1
    last_activation: str = "sigmoid"
    # MXU input dtype for the MLP matmuls ("float32" | "bfloat16").
    # bfloat16 feeds the systolic array at full rate with f32 accumulation
    # (``preferred_element_type``); params/activations stay float32.
    compute_dtype: str = "float32"

    @property
    def layer_dims(self) -> Sequence[Tuple[int, int]]:
        """(fan_in, fan_out) per linear layer, mirroring network.py:16-19."""
        in_dim = self.encoder.output_dim
        dims = [(in_dim, self.hidden_dim)]
        for i in range(1, self.num_layers - 1):
            fan_in = self.hidden_dim + (in_dim if i in self.skips else 0)
            dims.append((fan_in, self.hidden_dim))
        dims.append((self.hidden_dim, self.out_dim))
        return dims

    def init(self, key: jax.Array, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.layer_dims) + 1)
        enc_params = self.encoder.init(keys[0])
        layers = []
        for (fan_in, fan_out), k in zip(self.layer_dims, keys[1:]):
            kw, kb = jax.random.split(k)
            bound = 1.0 / jnp.sqrt(fan_in)
            w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
            b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
            layers.append({"w": w, "b": b})
        return {"encoder": enc_params, "layers": layers}

    def freeze(self, params):
        """Eval-time params (prebuilt encoder tables; see encoders.freeze)."""
        return dict(params, encoder=self.encoder.freeze(params["encoder"]))

    def apply(self, params, x):
        """x: [..., input_dim] world positions -> [..., out_dim]."""
        h = self.encoder.apply(params["encoder"], x, self.bound)
        input_pts = h
        act = _last_activation(self.last_activation)
        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            if i in self.skips:
                h = jnp.concatenate([input_pts, h], axis=-1)
            h = jnp.matmul(
                h.astype(cd), layer["w"].astype(cd),
                preferred_element_type=jnp.float32,
            ) + layer["b"]
            if i < n - 1:
                h = jax.nn.leaky_relu(h, _LEAKY_SLOPE)
            else:
                h = act(h)
        return h


def get_network(net_type: str):
    """Network factory mirroring ``src/network/__init__.py:4-8``."""
    if net_type == "mlp":
        return DensityFieldSpec
    raise NotImplementedError(f"Unknown network type {net_type!r}")
