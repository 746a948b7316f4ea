"""On-chip microbenchmarks for hash-encoder gather/scatter strategies.

Round-2 exploration: the round-1 encoder measured 0.22 s forward (gather)
and 2.24 s backward (scatter) per chest-scale step on the v5e chip
(VERDICT.md "What's missing" #2).  This script times the candidate
primitives in isolation so the redesign is driven by measured numbers,
not lowering folklore.  Results land in docs/microbench_encoder.md.

Workload constants (chest_50 scale, SURVEY.md §6):
  B = 1024 rays x 192 samples = 196,608 points
  L = 16 levels, 2^D = 8 corners, C = 2 channels
  N = B * 8 = 1,572,864 updates per level; 25.2M total
  table: [16, 2^19, 2] f32 = 64 MiB
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 196_608
L = 16
S = 1 << 19
C = 2
N = B * 8  # per-level updates


def fence(*xs) -> float:
    """Force completion via a device->host scalar (axon: block_until_ready
    can return early, see bench.py)."""
    tot = 0.0
    for x in xs:
        tot += float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:16]))
    return tot


def timeit(f, *args, iters=3, warmup=1):
    for _ in range(warmup):
        fence(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, secs, n_elems):
    print(f"{name:44s} {secs*1e3:9.2f} ms   {secs/n_elems*1e9:8.3f} ns/elem", flush=True)


def make_data(key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (L, S, C), dtype) * 1e-2
    idx = jax.random.randint(k2, (B, L, 8), 0, S, jnp.int32)
    w = jax.random.uniform(k3, (B, L, 8), jnp.float32)
    return table, idx, w


# --- forward: flat take over [L*S, C] ---------------------------------------
@jax.jit
def fwd_take(table, idx, w):
    flat = table.reshape(L * S, C)
    off = jnp.arange(L, dtype=jnp.int32)[None, :, None] * S
    vals = jnp.take(flat, idx + off, axis=0)
    return jnp.sum(w[..., None] * vals, axis=2).reshape(B, L * C)


# --- backward of take (XLA scatter-add) -------------------------------------
@jax.jit
def bwd_take(table, idx, w, ct):
    def loss(t):
        return jnp.vdot(fwd_take(t, idx, w), ct)
    return jax.grad(loss)(table)


# --- direct .at[].add --------------------------------------------------------
@jax.jit
def bwd_at_add(idx, payload):
    flat_idx = (idx + jnp.arange(L, dtype=jnp.int32)[None, :, None] * S).ravel()
    z = jnp.zeros((L * S, C), jnp.float32)
    return z.at[flat_idx].add(payload.reshape(-1, C))


# --- sort_key_val ------------------------------------------------------------
@jax.jit
def sort_kv(keys, val):
    return jax.lax.sort_key_val(keys, val, dimension=-1)


@jax.jit
def sort3(keys, v1, v2):
    return jax.lax.sort((keys, v1, v2), dimension=-1, num_keys=1)


# --- sorted segment-sum ------------------------------------------------------
@jax.jit
def bwd_sorted_segsum(keys_sorted, payload_sorted):
    # per-level: [L, N] keys, [L, N, C] payload
    def one(k, p):
        z = jnp.zeros((S, C), jnp.float32)
        return z.at[k].add(p, indices_are_sorted=True)
    return jax.vmap(one)(keys_sorted, payload_sorted)


# --- one-hot matmul throughput (bucket matmul building block) ---------------
@jax.jit
def onehot_matmul(local_idx, payload):
    # local_idx [Nb, M], payload [Nb, M, C]  -> [Nb, 512, C]
    oh = (local_idx[..., None] == jnp.arange(512, dtype=jnp.int32)).astype(jnp.bfloat16)
    return jnp.einsum("nmk,nmc->nkc", oh, payload.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


# --- pallas serial scatter ---------------------------------------------------
def pallas_scatter_level(idx_l, payload_l):
    """Accumulate N updates into one level's [S, C] table via a serial loop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 1 << 15

    def kernel(idx_ref, pay_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            j = idx_ref[i]
            out_ref[j, :] += pay_ref[i, :]
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(N // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,)),
            pl.BlockSpec((CHUNK, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((S, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, C), jnp.float32),
    )(idx_l, payload_l)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma list of bench names")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    def want(name):
        return not only or name in only

    key = jax.random.key(0)
    table, idx, w = make_data(key)
    n_total = B * L * 8

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    if want("fwd_take"):
        t = timeit(fwd_take, table, idx, w)
        report("fwd take f32 [L*S,C]", t, n_total)

    if want("fwd_take_bf16"):
        t = timeit(fwd_take, table.astype(jnp.bfloat16), idx, w)
        report("fwd take bf16", t, n_total)

    if want("bwd_take"):
        ct = jnp.ones((B, L * C), jnp.float32)
        t = timeit(bwd_take, table, idx, w, ct, iters=2)
        report("bwd take-VJP scatter", t, n_total)

    if want("bwd_at_add"):
        payload = jax.random.normal(jax.random.key(5), (B, L, 8, C), jnp.float32)
        t = timeit(bwd_at_add, idx, payload, iters=2)
        report("bwd .at[].add unsorted", t, n_total)

    if want("sort"):
        keys = idx.transpose(1, 0, 2).reshape(L, N)
        val = jax.random.normal(jax.random.key(6), (L, N), jnp.float32)
        t = timeit(sort_kv, keys, val)
        report("sort_key_val [16,1.57M] 1 payload", t, n_total)

    if want("sort3"):
        keys = idx.transpose(1, 0, 2).reshape(L, N)
        v1 = jax.random.normal(jax.random.key(6), (L, N), jnp.float32)
        v2 = jax.random.normal(jax.random.key(7), (L, N), jnp.float32)
        t = timeit(sort3, keys, v1, v2)
        report("sort 2 payloads", t, n_total)

    if want("segsum_sorted"):
        keys = idx.transpose(1, 0, 2).reshape(L, N)
        keys_sorted = jnp.sort(keys, axis=-1)
        payload = jax.random.normal(jax.random.key(8), (L, N, C), jnp.float32)
        t = timeit(bwd_sorted_segsum, keys_sorted, payload, iters=2)
        report("bwd at-add sorted flag (per level)", t, n_total)

    if want("onehot"):
        # 1.57M updates in buckets of 2048, one-hot width 512
        Nb, M = 768, 2048
        li = jax.random.randint(jax.random.key(9), (Nb, M), 0, 512, jnp.int32)
        pay = jax.random.normal(jax.random.key(10), (Nb, M, C), jnp.float32)
        t = timeit(onehot_matmul, li, pay)
        report("onehot bucket-matmul 1 level equiv", t, Nb * M)

    if want("pallas_scatter"):
        idx_l = idx[:, 0, :].reshape(N)
        pay_l = jax.random.normal(jax.random.key(11), (N, C), jnp.float32)
        f = jax.jit(pallas_scatter_level)
        t = timeit(f, idx_l, pay_l)
        report("pallas serial scatter (1 level)", t, N)


if __name__ == "__main__":
    main()
