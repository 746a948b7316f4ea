"""Benchmark: training throughput (rays/s, fwd+bwd+Adam) on one chip.

Workload matches the reference hot path at chest_50 scale (SURVEY.md §6 /
BASELINE.md): 1,024 rays x 192 samples/ray per optimizer step, 16-level
2^19-entry hash grid (level_dim 2), 4x32 skip MLP, MSE loss, Adam.  The
timed region is a scanned block of full optimizer steps — render forward,
backward through the hash encoder, gradient update — exactly what the
reference's ``train_step`` (src/trainer.py:134-142) does one step at a
time.

Robustness (the round-1 bench timed out and wedged the TPU worker —
docs/microbench_r2.md "Operational"):

- every timed block is SHORT (4 steps) and preceded by a progress print
  (stderr), so the driver always captures evidence of where we are;
- a staged fallback: a small-table stage runs first and publishes a valid
  JSON result; the full chest-scale stage then refines it — if the big
  stage dies, the small-stage number still lands;
- an in-process SIGALRM watchdog prints the best JSON so far and exits —
  the process is never killed externally while blocked on the device
  (which is what wedges the TPU worker).

Baseline for ``vs_baseline``: the reference publishes no numbers
(BASELINE.md), so we ESTIMATE from the NAF paper's single-RTX-3090
training envelope ("10-40 min per scene", arXiv:2209.14540) at the chest
workload: 1,500 epochs x 50 steps x 1,024 rays / 15 min ~= 85,000 rays/s.
The JSON labels this an estimate.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

WATCHDOG_S = 420          # global in-process deadline
REFERENCE_RAYS_PER_S = 85_000.0  # estimate; see module docstring

N_RAYS = 1024
N_SAMPLES = 192
STEPS_PER_BLOCK = 4       # short blocks: always completes (VERDICT r1 #1a)
N_BLOCKS = 3
N_VIEWS, H, W = 50, 256, 256

_best = None  # last successful stage's JSON dict


def _progress(msg: str) -> None:
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def _publish_and_exit(code: int = 0) -> None:
    if _best is not None:
        print(json.dumps(_best), flush=True)
    else:
        print(json.dumps({
            "metric": "train_rays_per_s_per_chip", "value": 0.0,
            "unit": "rays/s (fwd+bwd+adam, 192 samples/ray)",
            "vs_baseline": 0.0, "error": "no stage completed",
        }), flush=True)
    os._exit(code)


def _on_alarm(signum, frame):
    _progress("WATCHDOG fired — publishing best result so far")
    _publish_and_exit(0)


def build_workload(log2_hashmap_size: int, n_samples: int, steps: int,
                   backward: str = "bucket"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
    from neuralvolumetricreconstructionformedicalimages_tpu.config import (
        load_config, with_defaults)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
        build_model, init_state, make_epoch_fn)

    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["render"]["n_samples"] = n_samples
    cfg["train"]["n_rays"] = N_RAYS
    cfg["encoder"]["log2_hashmap_size"] = log2_hashmap_size
    cfg["encoder"]["backward"] = backward

    geo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(W, H), dDetector=(0.002, 0.002),
        nVoxel=(128, 128, 128), dVoxel=(0.002, 0.002, 0.002), mode="cone",
    )
    near, far = G.get_near_far(geo)
    angles = np.linspace(0, np.pi, N_VIEWS, endpoint=False).astype(np.float32)
    ro, rd = G.rays_for_angles(geo, angles)
    key = jax.random.key(0)
    arrays = {
        "rays": G.pack_rays(ro, rd, near, far),
        "projs": jax.random.uniform(key, (N_VIEWS, H, W)) * 0.1,
        "mask": jnp.ones((N_VIEWS, H, W), jnp.float32),
        "pools": jnp.broadcast_to(
            jnp.arange(H * W, dtype=jnp.int32), (N_VIEWS, H * W)
        ),
        "pool_counts": jnp.full((N_VIEWS,), H * W, jnp.int32),
    }

    spec = build_model(cfg)
    state = init_state(cfg, spec, steps_per_epoch=steps, key=jax.random.key(1))
    epoch_fn = make_epoch_fn(cfg, spec, steps, N_RAYS, n_batch=1, use_mask=False)
    view_order = jnp.asarray(
        np.arange(steps).reshape(-1, 1) % N_VIEWS, jnp.int32)
    return epoch_fn, state, arrays, view_order


def _fence(state, losses) -> float:
    """Force completion with a tiny device->host transfer.

    On the remote-TPU (axon) platform ``jax.block_until_ready`` can return
    before execution finishes, so timing is fenced by materializing values
    that depend on the full computation: the per-step losses and one
    parameter leaf from the final optimizer state.
    """
    import jax.numpy as jnp

    tail = float(jnp.sum(losses))
    tail += float(jnp.sum(state["params"]["coarse"]["layers"][-1]["b"]))
    return tail


def run_stage(name: str, log2_hashmap_size: int, backward: str = "bucket") -> float:
    """Time N_BLOCKS short scanned blocks; return best rays/s."""
    import jax

    _progress(f"stage {name}: building workload (2^{log2_hashmap_size} table, "
              f"{backward} backward)")
    epoch_fn, state, arrays, view_order = build_workload(
        log2_hashmap_size, N_SAMPLES, STEPS_PER_BLOCK, backward)

    _progress(f"stage {name}: compiling + warmup block")
    state, losses = epoch_fn(state, arrays, view_order, jax.random.key(10))
    _fence(state, losses)

    times = []
    for i in range(N_BLOCKS):
        _progress(f"stage {name}: timed block {i + 1}/{N_BLOCKS}")
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, arrays, view_order, jax.random.key(20 + i))
        _fence(state, losses)
        times.append(time.perf_counter() - t0)

    best = min(times)
    rate = STEPS_PER_BLOCK * N_RAYS / best
    _progress(f"stage {name}: block times {['%.3fs' % t for t in times]}"
              f" -> {rate:,.0f} rays/s")
    return rate


def main():
    global _best
    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(WATCHDOG_S)

    # Persistent compilation cache: if a prior run (or warmup) compiled the
    # same stages, the driver's timed invocation skips straight to execute.
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # noqa: BLE001
        _progress(f"compilation cache unavailable: {exc!r}")

    # Device responsiveness pre-check (a wedged remote worker blocks every
    # dispatch; docs/microbench_r2.md "Operational").
    import time as _time

    import jax.numpy as jnp

    _progress("device pre-check (trivial dispatch)")
    t0 = _time.perf_counter()
    float((jnp.ones((8,)) + 1).sum())
    _progress(f"device responsive in {_time.perf_counter() - t0:.1f}s")

    def record(rate: float, note: str) -> None:
        global _best
        _best = {
            "metric": "train_rays_per_s_per_chip",
            "value": round(rate, 1),
            "unit": "rays/s (fwd+bwd+adam, 192 samples/ray)",
            "vs_baseline": round(rate / REFERENCE_RAYS_PER_S, 3),
            "baseline_is_estimate": True,
            "note": note,
        }

    # Stage 1 — small table (2^15), pure-XLA take-VJP backward: the most
    # conservative full-train-step graph (no Pallas); guarantees a parsed
    # result even if later stages cannot finish.
    try:
        rate = run_stage("small-take", log2_hashmap_size=15, backward="take")
        record(rate, "FALLBACK small 2^15 table, take-VJP backward")
    except Exception as exc:  # noqa: BLE001
        _progress(f"stage small-take failed: {exc!r}")

    # Stage 2 — small table, Pallas bucket-matmul backward.
    try:
        rate = run_stage("small-bucket", log2_hashmap_size=15, backward="bucket")
        record(rate, "FALLBACK small 2^15 table, bucket-kernel backward")
    except Exception as exc:  # noqa: BLE001
        _progress(f"stage small-bucket failed: {exc!r}")

    # Stage 3 — full chest_50 scale (2^19 table, 16.8M params).
    try:
        rate = run_stage("chest", log2_hashmap_size=19, backward="bucket")
        record(rate, "chest_50 scale (16x2^19x2 table)")
    except Exception as exc:  # noqa: BLE001
        _progress(f"stage chest failed: {exc!r}")

    signal.alarm(0)
    _publish_and_exit(0 if _best is not None else 1)


if __name__ == "__main__":
    main()
