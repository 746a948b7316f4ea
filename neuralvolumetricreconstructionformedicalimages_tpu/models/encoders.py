"""Point encoders: multiresolution hash grid, NeRF frequency bands, identity.

Capability parity with the reference encoder factory
(``/root/reference/src/encoder/__init__.py:5-25``) — ``encoding`` one of
``hashgrid`` / ``frequency`` / ``None`` — but as immutable *specs* with
``init(key) -> params`` and ``apply(params, x, bound) -> features`` pure
functions.

The hash path dispatches to the Pallas TPU kernel when requested, with the
jnp gather implementation as the permanent correctness oracle/fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hash_encoding import HashGridSpec, hash_encode, hash_encode_fast


class EncoderSpec:
    """Interface: output_dim, init(key) -> params, apply(params, x, bound)."""

    output_dim: int

    def init(self, key):  # pragma: no cover - interface
        raise NotImplementedError

    def apply(self, params, x, bound: float):  # pragma: no cover - interface
        raise NotImplementedError

    def freeze(self, params):
        """Eval-time param preprocessing (default: no-op)."""
        return params


@dataclasses.dataclass(frozen=True)
class HashEncoderSpec(EncoderSpec):
    """Hash-grid encoder wrapper.

    Input range semantics match ``hashgrid.py:118-125``: real-world
    positions in [-bound, bound] are affinely mapped to [0, 1] before
    encoding.  Out-of-range inputs are *clamped* (the renderer already
    clamps to ``bound - 1e-6``, matching render.py:104-105; the reference
    raised ValueError, which has no jit equivalent).

    ``hash_variant`` selects the collision hash:

    - ``"coherent"`` (default): linear hash, TPU-fast path — sorted
      span-gather Pallas forward (``ops/span_gather.py``) + Pallas
      sort/bucket-matmul backward (``ops/bucket_matmul.py``).  Set
      ``fast=False`` for the pure-jnp oracle of the same hash (used by
      the equivalence tests).
    - ``"xor"``: the reference's XOR-prime hash (``hashencoder.cu:36-52``),
      bit-exact parity mode; pure-jnp gather path only (slow on TPU).
    """

    grid: HashGridSpec = HashGridSpec()
    hash_variant: str = "coherent"
    fast: bool = True
    # "sorted": sorted span-gather Pallas forward (one fused
    #   sort->stream->trilerp pipeline, no XLA row gathers) + the bucket
    #   backward.  Fastest; does not produce input (position) gradients
    #   — see ``input_grads``.
    # "rolled": rolled-table wide-row XLA gather forward (r4 fast path).
    forward: str = "sorted"
    # "bucket": custom_vjp sort + Pallas bucket-matmul into the rolled
    #   layout + adjoint corner rolls.
    # "take": plain autodiff over the rolled-table gather (pure XLA, no
    #   Pallas) — conservative fallback, ~wide-row scatter backward.
    #   (The "canonical" kernel variant was removed in r5 after two
    #   rounds of measuring 2.7x slower than "bucket";
    #   docs/batch_scaling_r4.md / docs/profile_r3.md A4b keep the data.)
    backward: str = "bucket"
    # dtype of the gather table ("float32" | "bfloat16").  With the
    # sorted forward, bfloat16 feeds the span kernel's one-hot MXU
    # selection at full rate (f32 needs a 6-pass HIGHEST contraction) and
    # halves span DMA traffic; the canonical table, gradients and Adam
    # state stay float32.  Quality measured neutral (docs/hash_quality.md).
    table_dtype: str = "float32"
    # Pack sort payloads (11/11/10-bit fracs, bf16 feature pairs) on the
    # sorted forward — fewer bitonic lanes.  See sorted_encode_features.
    pack_sort: bool = True
    # Route through the (slower) rolled forward when gradients wrt the
    # input positions are required — the sorted path returns zeros for
    # them (training never uses them: ray geometry is fixed and the fine
    # pass stop-gradients its z samples, render.py:74).
    input_grads: bool = False

    def __post_init__(self):
        if self.backward not in ("bucket", "take"):
            raise ValueError(
                f"backward must be 'bucket' or 'take', got {self.backward!r}"
            )
        if self.forward not in ("sorted", "rolled"):
            raise ValueError(
                f"forward must be 'sorted' or 'rolled', got {self.forward!r}"
            )
        if self.table_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"table_dtype must be 'float32' or 'bfloat16', "
                f"got {self.table_dtype!r}"
            )

    @property
    def output_dim(self) -> int:
        return self.grid.output_dim

    @property
    def _table_dtype(self):
        return jnp.bfloat16 if self.table_dtype == "bfloat16" else jnp.float32

    def init(self, key, dtype=jnp.float32):
        return {"table": self.grid.init(key, dtype=dtype)}

    def freeze(self, params):
        """Eval-time params: prebuild the rolled gather table ONCE.

        ``apply`` then uses the forward-only prebuilt path — the eval
        tiling loops (``render_image``/``query_field`` under ``lax.map``)
        no longer re-materialize the rolled table per tile.  Only valid
        while the canonical table is frozen (no gradients flow).
        """
        from ..ops.coherent_hash import build_rolled_table

        if self.hash_variant == "coherent" and self.fast:
            rolled = build_rolled_table(
                params["table"], self.grid, self._table_dtype)
            return dict(params, rolled=rolled)
        return params

    def apply(self, params, x, bound: float):
        from ..ops.coherent_hash import (
            coherent_encode,
            coherent_encode_prebuilt,
            coherent_encode_reference,
            coherent_encode_takevjp,
        )

        x01 = jnp.clip((x + bound) / (2.0 * bound), 0.0, 1.0)
        prefix = x01.shape[:-1]
        x01 = x01.reshape(-1, self.grid.input_dim)
        if self.hash_variant == "xor":
            # Reference-bit-exact XOR hash.  The forward is the narrow
            # corner gather either way (no static corner offsets to roll);
            # ``fast`` swaps the 1.6 s/step scatter backward for the
            # sort + bucket-matmul kernel on the corner-expanded stream.
            # ``backward='take'`` keeps the Pallas-free XLA scatter path
            # (ADVICE r4 #2: the knob now applies to both variants).
            if (self.fast and self.backward != "take"
                    and self.grid.table_size % 2048 == 0):
                out = hash_encode_fast(x01, params["table"], self.grid)
            else:
                out = hash_encode(x01, params["table"], self.grid)
        elif self.hash_variant == "coherent":
            if "rolled" in params:  # frozen eval params (see ``freeze``)
                out = coherent_encode_prebuilt(x01, params["rolled"], self.grid)
            elif self.fast and self.backward == "take":
                # Pure-XLA path; works for any table size.
                out = coherent_encode_takevjp(
                    x01, params["table"], self.grid, self._table_dtype)
            elif (self.fast and self.forward == "sorted"
                  and not self.input_grads
                  and self.grid.table_size % 2048 == 0):
                from ..ops.span_gather import sorted_encode

                out = sorted_encode(
                    x01, params["table"], self.grid, self._table_dtype,
                    self.pack_sort)
            elif self.fast and self.grid.table_size % 2048 == 0:
                # The bucket kernel tiles the table into fixed-width
                # buckets; tiny test tables use the oracle path below.
                out = coherent_encode(
                    x01, params["table"], self.grid, self._table_dtype,
                    self.backward)
            else:
                out = coherent_encode_reference(x01, params["table"], self.grid)
        else:
            raise NotImplementedError(
                f"Unknown hash_variant {self.hash_variant!r}"
            )
        return out.reshape(*prefix, self.output_dim)


@dataclasses.dataclass(frozen=True)
class FreqEncoderSpec(EncoderSpec):
    """NeRF-style sin/cos positional encoding (freqencoder.py:5-43)."""

    input_dim: int = 3
    max_freq_log2: float = 5.0
    n_freqs: int = 6
    log_sampling: bool = True
    include_input: bool = True

    @property
    def freq_bands(self) -> np.ndarray:
        if self.log_sampling:
            return np.exp2(
                np.linspace(0.0, self.max_freq_log2, self.n_freqs)
            ).astype(np.float32)
        return np.linspace(1.0, 2.0**self.max_freq_log2, self.n_freqs).astype(np.float32)

    @property
    def output_dim(self) -> int:
        d = self.input_dim * self.n_freqs * 2
        if self.include_input:
            d += self.input_dim
        return d

    def init(self, key):
        return {}

    def apply(self, params, x, bound: float):
        del params, bound  # stateless; reference ignores bound too
        outs = [x] if self.include_input else []
        for freq in self.freq_bands:
            outs.append(jnp.sin(x * freq))
            outs.append(jnp.cos(x * freq))
        return jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass(frozen=True)
class IdentityEncoderSpec(EncoderSpec):
    """Pass-through encoder (``encoding: "None"``)."""

    input_dim: int = 3

    @property
    def output_dim(self) -> int:
        return self.input_dim

    def init(self, key):
        return {}

    def apply(self, params, x, bound: float):
        del params, bound
        return x


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    multires: int = 6,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    hash_variant: str = "coherent",
    fast: bool = True,
    forward: str = "sorted",
    backward: str = "bucket",
    table_dtype: str = "float32",
    pack_sort: bool = True,
    input_grads: bool = False,
    **kwargs,
) -> EncoderSpec:
    """Encoder factory mirroring ``src/encoder/__init__.py:5-25``."""
    if encoding == "None":
        return IdentityEncoderSpec(input_dim=input_dim)
    if encoding == "frequency":
        return FreqEncoderSpec(
            input_dim=input_dim, max_freq_log2=multires - 1, n_freqs=multires
        )
    if encoding == "hashgrid":
        return HashEncoderSpec(
            grid=HashGridSpec(
                input_dim=input_dim,
                num_levels=num_levels,
                level_dim=level_dim,
                base_resolution=base_resolution,
                log2_hashmap_size=log2_hashmap_size,
            ),
            hash_variant=hash_variant,
            fast=fast,
            forward=forward,
            backward=backward,
            table_dtype=table_dtype,
            pack_sort=pack_sort,
            input_grads=input_grads,
        )
    raise NotImplementedError(f"Unknown encoding {encoding!r}")
