"""Training-stack tests: LR schedule semantics, epoch step, loss estimator,
checkpoint round-trip.  All on the CPU test mesh (conftest)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu.config import with_defaults
from neuralvolumetricreconstructionformedicalimages_tpu.data import generate, make_dataset
from neuralvolumetricreconstructionformedicalimages_tpu.losses import masked_mse
from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
    build_model,
    init_state,
    make_epoch_fn,
    make_lr_schedule,
)


def tiny_cfg(tmp_path=None, **over):
    cfg = {
        "exp": {"expname": "t", "expdir": str(tmp_path or "."), "datadir": ""},
        "network": {"net_type": "mlp", "num_layers": 4, "hidden_dim": 16,
                    "skips": [2], "out_dim": 1, "last_activation": "sigmoid",
                    "bound": 0.3},
        "encoder": {"encoding": "hashgrid", "input_dim": 3, "num_levels": 4,
                    "level_dim": 2, "base_resolution": 4, "log2_hashmap_size": 9},
        "render": {"n_samples": 32, "n_fine": 0, "perturb": True,
                   "raw_noise_std": 0.0, "netchunk": 4096},
        "train": {"epoch": 2, "n_batch": 1, "n_rays": 64, "lrate": 1e-3,
                  "lrate_gamma": 0.1, "lrate_step": 10, "resume": False},
        "log": {"i_eval": 0, "i_save": 0},
    }
    for k, v in over.items():
        cfg[k].update(v)
    return with_defaults(cfg)


def tiny_dataset(n_rays=64):
    scan = dict(nVoxel=[16, 16, 16], dVoxel=[4.0, 4.0, 4.0],
                nDetector=[16, 16], dDetector=[5.0, 5.0],
                numTrain=4, numVal=2, mode="parallel")
    data = generate(scan, phantom="ball", seed=0)
    return make_dataset(data, "train", n_rays=n_rays)


def test_lr_schedule_steplr_semantics():
    """StepLR(step_size=lrate_step epochs, gamma) in optimizer-step units
    (src/trainer.py:57-58)."""
    cfg = tiny_cfg()
    cfg["train"].update(lrate=1.0, lrate_gamma=0.5, lrate_step=3)
    sched = make_lr_schedule(cfg, steps_per_epoch=4)
    # epochs 0-2 -> lr 1.0 ; epochs 3-5 -> 0.5 ; epoch 6 -> 0.25
    assert float(sched(0)) == 1.0
    assert float(sched(4 * 3 - 1)) == 1.0
    assert float(sched(4 * 3)) == 0.5
    assert float(sched(4 * 6)) == 0.25


def test_masked_mse_equals_boolean_indexing():
    """Static-shape weighted mean == dynamic mean((x[m]-y[m])^2) (train.py:127)."""
    rng = np.random.default_rng(0)
    x = rng.random(100).astype(np.float32)
    y = rng.random(100).astype(np.float32)
    m = (rng.random(100) > 0.4)
    want = np.mean((x[m] - y[m]) ** 2)
    got = float(masked_mse(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_epoch_fn_trains():
    cfg = tiny_cfg(train={"lrate": 1e-2})
    ds = tiny_dataset(64)
    spec = build_model(cfg)
    steps = ds.n_views
    state = init_state(cfg, spec, steps, jax.random.key(0))
    epoch_fn = make_epoch_fn(cfg, spec, steps, 64, 1, use_mask=False)
    arrays = {"rays": ds.rays, "projs": ds.projs, "mask": ds.mask,
              "pools": ds.pools, "pool_counts": ds.pool_counts}
    order = jnp.arange(ds.n_views).reshape(steps, 1)

    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state["params"])
    losses_all = []
    for e in range(20):
        state, losses = epoch_fn(state, arrays, order, jax.random.key(e + 1))
        losses_all.append(np.asarray(losses))
    losses_all = np.concatenate(losses_all)
    assert np.isfinite(losses_all).all()
    assert int(state["step"]) == 20 * steps
    # loss should drop substantially on this trivial scene
    assert losses_all[-steps:].mean() < 0.5 * losses_all[:steps].mean()
    # params actually moved
    moved = jax.tree.map(lambda a, b: np.abs(np.asarray(a) - b).max(),
                         state["params"], p0)
    assert max(jax.tree.leaves(moved)) > 0


def test_epoch_fn_fine_network():
    cfg = tiny_cfg(render={"n_fine": 8})
    ds = tiny_dataset(32)
    spec = build_model(cfg)
    state = init_state(cfg, spec, ds.n_views, jax.random.key(0))
    assert "fine" in state["params"]
    epoch_fn = make_epoch_fn(cfg, spec, ds.n_views, 32, 1, use_mask=False)
    arrays = {"rays": ds.rays, "projs": ds.projs, "mask": ds.mask,
              "pools": ds.pools, "pool_counts": ds.pool_counts}
    order = jnp.arange(ds.n_views).reshape(-1, 1)
    state, losses = epoch_fn(state, arrays, order, jax.random.key(1))
    assert np.isfinite(np.asarray(losses)).all()


def test_n_batch_views_per_step():
    cfg = tiny_cfg(train={"n_batch": 2})
    ds = tiny_dataset(32)
    spec = build_model(cfg)
    steps = ds.n_views // 2
    state = init_state(cfg, spec, steps, jax.random.key(0))
    epoch_fn = make_epoch_fn(cfg, spec, steps, 32, 2, use_mask=False)
    arrays = {"rays": ds.rays, "projs": ds.projs, "mask": ds.mask,
              "pools": ds.pools, "pool_counts": ds.pool_counts}
    order = jnp.arange(ds.n_views).reshape(steps, 2)
    state, losses = epoch_fn(state, arrays, order, jax.random.key(1))
    assert losses.shape == (steps,)
    assert np.isfinite(np.asarray(losses)).all()


def test_checkpoint_roundtrip(tmp_path):
    import orbax.checkpoint as ocp

    cfg = tiny_cfg()
    spec = build_model(cfg)
    state = init_state(cfg, spec, 4, jax.random.key(0))
    mgr = ocp.CheckpointManager(
        os.fspath(tmp_path / "ckpt"),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True))
    mgr.save(3, args=ocp.args.Composite(state=ocp.args.StandardSave(state)))
    mgr.wait_until_finished()
    assert mgr.latest_step() == 3
    restored = mgr.restore(3, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(state)))["state"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state["params"], restored["params"])
