"""Training loop: functional core (optax + lax.scan epochs) + thin orchestrator.

Capability parity with the reference training stack
(``/root/reference/src/trainer.py`` + ``train.py:35-135``) re-designed
TPU-first:

- The reference dispatches one optimizer step per Python iteration with
  internal chunking loops of 200 rays (``train.py:69``).  Here a whole
  epoch is one jitted ``lax.scan`` over view minibatches — the host touches
  the device once per epoch, and each step renders all ``n_rays`` in a
  single fused XLA computation.
- Adam(0.9, 0.999) + per-epoch StepLR decay (``src/trainer.py:54-58``)
  expressed as an optax schedule in optimizer-step units.
- Masked MSE over the ptycho beam mask replaces the reference's dynamic
  boolean indexing (``train.py:127``) with a static-shaped weighted mean —
  the identical estimator.
- Checkpoint/resume via Orbax (``max_to_keep=2`` mirrors the reference's
  ckpt + backup pair, ``src/trainer.py:114-126``).
- Eval parity with ``train.py:220-288``: one random val view full-image
  render, dense voxel-grid query, proj MSE/PSNR + 3D PSNR/SSIM, slice
  mosaics, npy/png/stats.txt artifacts.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import geometry as G
from ..config import with_defaults
from ..data.dataset import ProjectionDataset, gather_view_batch, load_dataset
from ..losses import get_loss_fn
from ..metrics import (
    cast_to_image,
    get_mse,
    get_psnr,
    get_psnr_3d,
    get_ssim_3d,
)
from ..models import get_encoder, get_network
from ..render import render_image, render_rays, query_field
from ..utils.logging import ExperimentLogger
from ..utils.profiling import StepTimer, block
from .optim import make_lr_schedule, make_optimizer


# --------------------------------------------------------------------------
# Functional core
# --------------------------------------------------------------------------

def build_model(cfg: Dict[str, Any]):
    """Network + encoder from the config schema (src/trainer.py:43-51).

    The ``parallel`` precision policy feeds in here: ``table_dtype``
    (rolled gather table) and ``compute_dtype`` (MLP MXU inputs) — both
    f32 by default, bfloat16 for the TPU-fast configuration.
    """
    par = cfg.get("parallel", {})
    enc_cfg = dict(cfg["encoder"])
    enc_cfg.setdefault("table_dtype", par.get("table_dtype", "float32"))
    enc = get_encoder(**enc_cfg)
    net_cfg = dict(cfg["network"])
    net_type = net_cfg.pop("net_type", "mlp")
    net_cfg["skips"] = tuple(net_cfg.get("skips", (4,)))
    net_cfg.setdefault("compute_dtype", par.get("compute_dtype", "float32"))
    spec = get_network(net_type)(encoder=enc, **net_cfg)
    return spec


def init_state(cfg: Dict[str, Any], spec, steps_per_epoch: int,
               key: jax.Array) -> Dict[str, Any]:
    """TrainState pytree: params (+ optional fine params), opt state, step."""
    n_fine = int(cfg["render"]["n_fine"])
    k1, k2 = jax.random.split(key)
    params = spec.init(k1)
    params_fine = spec.init(k2) if n_fine > 0 else None
    opt = make_optimizer(cfg, steps_per_epoch)
    trainable = {"coarse": params, "fine": params_fine} if n_fine > 0 else {"coarse": params}
    return {
        "params": trainable,
        "opt_state": opt.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }


def make_epoch_fn(cfg: Dict[str, Any], spec, steps_per_epoch: int,
                  n_rays: int, n_batch: int, use_mask: bool,
                  geo=None, near: float = 0.0, far: float = 0.0):
    """One jitted epoch: lax.scan of train steps over view minibatches.

    Returns fn(state, arrays, view_order [steps, n_batch], key)
    -> (state, metrics { 'loss': [steps], 'lr': [steps] }).

    ``geo``/``near``/``far`` enable the on-the-fly ray mode (arrays with
    "angles" instead of "rays"; see data/dataset.py) — unused otherwise.
    """
    render_cfg = cfg["render"]
    n_samples = int(render_cfg["n_samples"])
    n_fine = int(render_cfg["n_fine"])
    perturb = bool(render_cfg["perturb"])
    raw_noise_std = float(render_cfg["raw_noise_std"])
    opt = make_optimizer(cfg, steps_per_epoch)
    has_fine = n_fine > 0
    loss_calc = get_loss_fn(cfg["train"].get("loss", "mse"))

    def loss_fn(params, batch, key):
        out = render_rays(
            batch["rays"], params["coarse"], spec,
            n_samples=n_samples, n_fine=n_fine,
            perturb=perturb, raw_noise_std=raw_noise_std, key=key,
            params_fine=params.get("fine") if has_fine else None,
            spec_fine=spec if has_fine else None,
        )
        mask = batch["mask"] if use_mask else None
        aux = {"tv_loss": out["tv_loss"], "tv_density": out["tv_density"]}
        loss, _ = loss_calc(out["acc"], batch["projs"], mask, aux)
        if has_fine:
            # Regularizer terms (tv/small/zero) are counted ONCE — on the
            # primary (fine) loss above; the coarse-pass loss gets no aux
            # so their effective weight is independent of n_fine.
            loss0, _ = loss_calc(out["acc0"], batch["projs"], mask)
            loss = loss + loss0
        return loss

    def train_step(state, arrays, views, key):
        k_pix, k_render = jax.random.split(key)
        pix_keys = jax.random.split(k_pix, n_batch)

        batches = jax.vmap(
            lambda v, k: gather_view_batch(arrays, v, k, n_rays,
                                           geo=geo, near=near, far=far)
        )(views, pix_keys)
        batch = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batches)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch, k_render)
        updates, opt_state = opt.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}
        return new_state, loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state, arrays, view_order, key):
        def body(carry, xs):
            views, k = xs
            new_state, loss = train_step(carry, arrays, views, k)
            return new_state, loss

        keys = jax.random.split(key, view_order.shape[0])
        state, losses = jax.lax.scan(body, state, (view_order, keys))
        return state, losses

    return epoch_fn


# --------------------------------------------------------------------------
# Orchestrator
# --------------------------------------------------------------------------

class Trainer:
    """Reference-shaped trainer (``Trainer``/``BasicTrainer``) over the
    functional core.  Subclass and override ``eval_step`` for custom evals
    (parity with src/trainer.py:16,151)."""

    def __init__(self, cfg: Dict[str, Any], workdir: Optional[str] = None):
        cfg = with_defaults(cfg)
        self.cfg = cfg
        self.n_fine = int(cfg["render"]["n_fine"])
        self.epochs = int(cfg["train"]["epoch"])
        self.i_eval = int(cfg["log"]["i_eval"])
        self.i_save = int(cfg["log"]["i_save"])
        self.n_rays = int(cfg["train"]["n_rays"])
        self.n_batch = int(cfg["train"]["n_batch"])

        self.expdir = workdir or osp.join(cfg["exp"]["expdir"], cfg["exp"]["expname"])
        self.ckptdir = osp.join(self.expdir, "ckpt")
        self.evaldir = osp.join(self.expdir, "eval")
        os.makedirs(self.evaldir, exist_ok=True)

        # Datasets (device-resident)
        datadir = cfg["exp"]["datadir"]
        ray_mode = str(cfg["train"].get("ray_mode", "auto"))
        self.train_dset = load_dataset(datadir, "train", self.n_rays,
                                       ray_mode=ray_mode)
        self.eval_dset = (load_dataset(datadir, "val", self.n_rays,
                                       ray_mode=ray_mode)
                          if self.i_eval > 0 else None)
        self.use_mask = bool(float(np.asarray(self.train_dset.mask).min()) < 1.0)

        self.steps_per_epoch = max(1, self.train_dset.n_views // self.n_batch)

        # Model + state
        self.spec = build_model(cfg)
        seed = int(cfg["train"].get("seed", 42))
        self.key = jax.random.key(seed)
        self.key, k_init = jax.random.split(self.key)
        self.state = init_state(cfg, self.spec, self.steps_per_epoch, k_init)
        self.epoch_start = 0
        self.global_step = 0
        self.last_epoch = 0

        # Checkpointing (Orbax; max_to_keep=2 ~ ckpt + backup, trainer.py:114-126)
        import orbax.checkpoint as ocp

        self._ckpt_mgr = ocp.CheckpointManager(
            osp.abspath(self.ckptdir),
            options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
        )
        if cfg["train"]["resume"] and self._ckpt_mgr.latest_step() is not None:
            self.restore()

        # Logging
        self.logger = ExperimentLogger(self.expdir)
        import json

        self.logger.add_text("parameters", json.dumps(_jsonable(cfg), indent=2))

        # Jitted epoch.  When ``parallel.mesh`` names a multi-device mesh
        # (e.g. ``{data: 4, sample: 2}``) the epoch runs as a shard_map over
        # it: rays data-parallel, optional depth-sample split, exact psum'd
        # global losses (parallel/step.py).  Same signature either way —
        # checkpoints, eval and resume are mesh-agnostic because the state
        # stays fully replicated (P() in/out specs).
        self.mesh = None
        mesh_cfg = cfg.get("parallel", {}).get("mesh")
        if mesh_cfg:
            from ..parallel.mesh import MeshSpec, make_mesh

            mspec = MeshSpec.from_config(mesh_cfg)
            # a 1-device mesh is honored too (force_mesh measurement mode)
            if mspec.n_devices > 1 or bool(cfg["parallel"].get("force_mesh")):
                self.mesh = make_mesh(mspec)

        if self.mesh is not None:
            from ..parallel.step import make_sharded_epoch_fn

            self._epoch_fn = make_sharded_epoch_fn(
                cfg, self.spec, self.mesh, self.steps_per_epoch,
                n_rays=self.n_rays, n_batch=self.n_batch,
                use_mask=self.use_mask, geo=self.train_dset.geo,
                near=self.train_dset.near, far=self.train_dset.far)
        else:
            self._epoch_fn = make_epoch_fn(
                cfg, self.spec, self.steps_per_epoch, self.n_rays, self.n_batch,
                self.use_mask, geo=self.train_dset.geo,
                near=self.train_dset.near, far=self.train_dset.far)
        self._arrays = self.train_dset.arrays()

    # -- persistence -----------------------------------------------------
    def save(self, epoch: int) -> None:
        import orbax.checkpoint as ocp

        self._ckpt_mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(self.state),
            ),
        )
        self._ckpt_mgr.wait_until_finished()

    def restore(self) -> None:
        import orbax.checkpoint as ocp

        step = self._ckpt_mgr.latest_step()
        restored = self._ckpt_mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(self.state),
            ),
        )
        self.state = restored["state"]
        self.epoch_start = int(step) + 1
        self.global_step = self.epoch_start * self.steps_per_epoch
        print(f"[RESUME] from epoch {step} ({self.ckptdir})")

    # -- schedules -------------------------------------------------------
    def _view_order(self, epoch: int) -> np.ndarray:
        """[steps_per_epoch, n_batch] view indices; sequential like the
        reference DataLoader (shuffle off, src/trainer.py:39), optionally
        shuffled per-epoch."""
        n = self.train_dset.n_views
        order = np.arange(n)
        if self.cfg["train"].get("shuffle_views"):
            order = np.random.default_rng(epoch).permutation(n)
        usable = self.steps_per_epoch * self.n_batch
        return order[:usable].reshape(self.steps_per_epoch, self.n_batch)

    def current_lr(self) -> float:
        sched = make_lr_schedule(self.cfg, self.steps_per_epoch)
        return float(sched(self.global_step))

    # -- loop ------------------------------------------------------------
    def start(self, deadline: Optional[float] = None) -> None:
        """Main loop (src/trainer.py:83-131).

        ``deadline``: optional absolute ``time.time()`` budget; training
        stops cleanly BETWEEN epochs once it passes (never interrupting an
        in-flight device call), leaving ``self.last_epoch`` at the last
        completed epoch.
        """
        timer = StepTimer()
        t_start = time.time()
        for idx_epoch in range(self.epoch_start, self.epochs + 1):
            if deadline is not None and time.time() > deadline:
                print(f"[deadline] stopping before epoch {idx_epoch} "
                      f"({time.time() - t_start:.0f}s elapsed)")
                break
            self.last_epoch = idx_epoch
            if self.i_eval > 0 and (idx_epoch % self.i_eval == 0 or idx_epoch == self.epochs):
                metrics = self.eval_step(self.global_step, idx_epoch)
                msg = ", ".join(f"{k}: {v:.4g}" for k, v in metrics.items())
                print(f"[EVAL] epoch: {idx_epoch}/{self.epochs}, {msg}")

            self.key, k_epoch = jax.random.split(self.key)
            order = jnp.asarray(self._view_order(idx_epoch))
            self.state, losses = self._epoch_fn(self.state, self._arrays, order, k_epoch)
            losses = np.asarray(losses)
            if not np.isfinite(losses).all():
                # numerical-health check, parity with the renderer's
                # nan/inf printout (reference render.py:142-144)
                print(f"! [Numerical Error] epoch {idx_epoch}: loss contains "
                      f"nan/inf ({losses})")
            self.global_step += self.steps_per_epoch
            timer.tick()

            self.logger.add_scalar("train/loss", float(losses.mean()), self.global_step)
            self.logger.add_scalar("train/lr", self.current_lr(), self.global_step)
            if idx_epoch % 25 == 0 or idx_epoch == self.epochs:
                rate = (self.steps_per_epoch * self.n_rays * self.n_batch /
                        timer.ema) if timer.ema else float("nan")
                print(f"epoch={idx_epoch}/{self.epochs} loss={losses.mean():.4g} "
                      f"lr={self.current_lr():.3g} rays/s={rate:,.0f} "
                      f"elapsed={time.time()-t_start:.0f}s")

            if (self.i_save > 0 and idx_epoch > 0
                    and (idx_epoch % self.i_save == 0 or idx_epoch == self.epochs)):
                print(f"[SAVE] epoch: {idx_epoch}/{self.epochs}, path: {self.ckptdir}")
                self.save(idx_epoch)
        self.logger.flush()
        print(f"Training complete! See logs in {self.expdir}")

    # -- eval ------------------------------------------------------------
    def eval_step(self, global_step: int, idx_epoch: int) -> Dict[str, float]:
        """Eval parity with train.py:220-288 (and the masked variant
        ``eval_stepMASK``, train.py:138-218, when ``log.eval_mask`` is on).

        Projections are compared in complex64 like the reference
        (train.py:227-229) — a no-op for real data, and the complex-aware
        metrics handle measured phase stacks.  With ``eval_mask`` the beam
        mask (threshold 0.007 ptycho mask from ``full_proj``, train.py:60)
        multiplies both gt and prediction before the metrics — the
        laminography variant the reference sketches at train.py:163-165.
        """
        dset = self.eval_dset
        assert dset is not None
        sel = int(np.random.default_rng(idx_epoch).integers(dset.n_views))
        projs_gt = np.asarray(dset.projs[sel]).astype(np.complex64)
        H, W = projs_gt.shape
        rays = dset.view_rays(sel)

        params = self.state["params"]
        # Prebuild the encoder's rolled gather table ONCE per eval; the
        # tiled render/query loops below then reuse it instead of
        # re-materializing it per lax.map tile (the round-2 chest-scale
        # eval hang).
        coarse = self.spec.freeze(params["coarse"])
        fine = (self.spec.freeze(params["fine"])
                if params.get("fine") is not None else None)
        eval_params = fine if (self.n_fine > 0 and fine is not None) else coarse

        acc = render_image(
            rays, coarse, self.spec,
            n_samples=int(self.cfg["render"]["n_samples"]),
            tile=min(4096, H * W),
            n_fine=self.n_fine,
            params_fine=fine, spec_fine=self.spec if self.n_fine > 0 else None,
        )
        projs_pred = np.asarray(acc).reshape(H, W).astype(np.complex64)

        if bool(self.cfg["log"].get("eval_mask", False)):
            beam_mask = np.asarray(dset.mask[sel]).astype(np.complex64)
            projs_gt = projs_gt * beam_mask
            projs_pred = projs_pred * beam_mask

        image_gt = np.asarray(dset.image) if dset.image is not None else None
        metrics: Dict[str, float] = {
            "proj_mse": get_mse(projs_pred, projs_gt),
            "proj_psnr": get_psnr(projs_pred, projs_gt),
        }
        image_pred = None
        if image_gt is not None and dset.voxels is not None:
            netchunk = int(self.cfg["render"].get("netchunk", 262144))
            image_pred = np.asarray(
                query_field(dset.voxels, eval_params, self.spec,
                            tile=netchunk))[..., 0]
            metrics["psnr_3d"] = get_psnr_3d(image_pred, image_gt)
            metrics["ssim_3d"] = get_ssim_3d(image_pred, image_gt)

        self.logger.add_scalars(metrics, global_step, prefix="eval/")

        # slice mosaic + artifacts (train.py:261-286)
        eval_save_dir = osp.join(self.evaldir, f"epoch_{idx_epoch:05d}")
        os.makedirs(eval_save_dir, exist_ok=True)
        show_proj = np.concatenate([projs_gt, projs_pred], axis=1)
        self.logger.add_image("eval/projection (left: gt, right: pred)",
                              cast_to_image(show_proj), global_step)
        if image_pred is not None:
            show_slice = 5
            show_step = max(1, image_gt.shape[-1] // show_slice)
            rows = []
            for i_show in range(show_slice):
                k = min(i_show * show_step, image_gt.shape[-1] - 1)
                rows.append(np.concatenate(
                    [image_gt[..., k], image_pred[..., k]], axis=0))
            show_density = np.concatenate(rows, axis=1)
            self.logger.add_image("eval/density (row1: gt, row2: pred)",
                                  cast_to_image(show_density), global_step)
            np.save(osp.join(eval_save_dir, "image_pred.npy"), image_pred)
            np.save(osp.join(eval_save_dir, "image_gt.npy"), image_gt)
            _save_png(osp.join(eval_save_dir, "slice_show_row1_gt_row2_pred.png"),
                      cast_to_image(show_density))
        _save_png(osp.join(eval_save_dir, "proj_show_left_gt_right_pred.png"),
                  cast_to_image(show_proj))
        with open(osp.join(eval_save_dir, "stats.txt"), "w") as f:
            for key, value in metrics.items():
                f.write("%s: %f\n" % (key, value))
        return metrics


def _save_png(path: str, img01: np.ndarray) -> None:
    try:
        import imageio.v2 as iio

        iio.imwrite(path, (np.clip(img01[..., 0], 0, 1) * 255).astype(np.uint8))
    except Exception:
        pass


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.generic,)):
        return obj.item()
    return obj
