"""Training loops for both codecs.

Mirrors train() in trainRGB.py:158-255 and trainmask.py:149-239:
RD loss = lambda * distortion + bpp, Adam with value-clipped grads, LR step
decay, windowed meters, periodic rotating snapshots + full checkpoints +
eval. The RGB loop keeps the curriculum: before ``curriculum_step`` (500k)
the input is the full image with an all-ones mask (trainRGB.py:172-174) and
the GT mask is used as the recon mask for gating (:177).

TPU-native: one jitted train step, batch sharded over the ``data`` mesh
axis, params replicated; host-side data loading overlaps device compute via
the prefetching BatchLoader.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..core.precision import policy_from_str
from ..models.mask_codec import MaskCodec
from ..models.rgb_codec import RGBCodec
from ..ops.mask_pyramid import mask_pyramid
from ..parallel.mesh import make_mesh, shard_batch, replicated_sharding
from .checkpoint import save_checkpoint, save_rotating
from .meters import AverageMeter
from .state import (CodecTrainState, make_optimizers, make_train_state,
                    make_train_step)

logger = logging.getLogger("rgba_tpu")


def _mask_loss_fn(model: MaskCodec, cfg: TrainConfig):
    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["alpha"], training=True,
                          rngs={"noise": rng})
        rd = cfg.train_lambda * out["mse_loss"] + out["bpp"]
        return rd, {"mse_loss": out["mse_loss"], "bpp": out["bpp"],
                    "bpp_y": out["bpp_y"], "bpp_z": out["bpp_z"]}
    return loss_fn


def _rgb_loss_fn(model: RGBCodec, cfg: TrainConfig):
    if cfg.distortion not in ("mse", "msssim"):
        raise ValueError(f"unknown distortion: {cfg.distortion!r}")

    def loss_fn(params, batch, rng):
        mask = batch["alpha"]
        me = mask_pyramid(mask)
        out = model.apply({"params": params}, batch["masked_image"], mask,
                          mask, me, training=True, rngs={"noise": rng})
        if cfg.distortion == "msssim":
            # 1 - masked MS-SSIM over the alpha-visible region — the
            # reference carries this as the commented-out distortion
            # (trainRGB.py:183, plain ms_ssim there; the masked variant is
            # the RGBA-correct form and reduces to it for all-ones masks).
            from ..metrics.ms_ssim import masked_ms_ssim
            distortion = 1.0 - masked_ms_ssim(
                batch["masked_image"], out["x_hat"], mask, data_range=1.0)
        else:
            distortion = out["mse_loss"]
        rd = cfg.train_lambda * distortion + out["bpp"]
        return rd, {"mse_loss": out["mse_loss"], "bpp": out["bpp"],
                    "bpp_y": out["bpp_y"], "bpp_z": out["bpp_z"]}
    return loss_fn


def _aux_loss_fn(model):
    def fn(params):
        return model.apply({"params": params},
                           method=lambda m: m.aux_loss())
    return fn


class Trainer:
    """Shared machinery for both codecs."""

    def __init__(self, model, cfg: TrainConfig, loss_fn, save_path: str,
                 mesh=None, snapshot_keep_after: int = 1_495_000,
                 image_dump_dir: str = ""):
        self.model = model
        self.cfg = cfg
        self.save_path = save_path
        if mesh is None:
            import math
            n = cfg.num_devices if cfg.num_devices > 0 else len(jax.devices())
            # the data axis must divide the batch
            n = math.gcd(cfg.batch_size, n)
            mesh = make_mesh(n)
        self.mesh = mesh
        self.snapshot_keep_after = snapshot_keep_after
        self.image_dump_dir = image_dump_dir

        self.loss_fn = loss_fn
        self.aux_loss_fn = _aux_loss_fn(model)
        self._step_fn = None
        self._dump_fn = None
        # only these batch keys are moved to device (host->device transfer
        # of unused arrays dominated step time in profiling)
        self.batch_keys = ("masked_image", "alpha", "image")

    def init_state(self, example_batch, seed: Optional[int] = None,
                   params=None, step: int = 0) -> CodecTrainState:
        # Build the whole state on the LOCAL CPU backend: un-jitted flax
        # init (and optax's per-leaf zeros_like) runs one primitive at a
        # time, and through the axon tunnel each eager primitive pays a
        # remote compile — the RGB codec's init silently stalls 40+ min
        # on-device vs seconds on host, with bit-identical params
        # (utils/init.py).  The tree moves to the device once, below.
        cpu = jax.local_devices(backend="cpu")[0]
        params = jax.tree_util.tree_map(
            lambda a: np.asarray(jax.device_get(a)), params)
        with jax.default_device(cpu):
            if params is None:
                rng = jax.random.PRNGKey(
                    seed if seed is not None else self.cfg.seed)
                init_batch = {
                    k: jnp.asarray(np.asarray(jax.device_get(v[:1])))
                    for k, v in example_batch.items()}
                params = self._init_params(rng, init_batch)
            state = make_train_state(self.cfg, params, step=step)
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _init_params(self, rng, batch):
        raise NotImplementedError

    def compiled_step(self):
        if self._step_fn is None:
            main_tx, aux_tx = make_optimizers(self.cfg)
            raw = make_train_step(self.cfg, self.loss_fn, self.aux_loss_fn)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step_fn(state, batch, rng):
                return raw(state, batch, rng, main_tx, aux_tx)

            self._step_fn = step_fn
        return self._step_fn

    def train(self, loader, state: CodecTrainState, tb_writer=None,
              eval_fn: Callable[[int, CodecTrainState], None] = None,
              max_steps: Optional[int] = None):
        cfg = self.cfg
        step_fn = self.compiled_step()
        meters = {k: AverageMeter(cfg.print_freq)
                  for k in ("elapsed", "loss", "psnr", "bpp", "bpp_y",
                            "bpp_z", "mse")}
        rng = jax.random.PRNGKey(cfg.seed)
        step = int(state.step)
        tot = max_steps if max_steps is not None else cfg.tot_step
        # re-derive the epoch from the resumed step like the reference
        # (trainRGB.py:388: epoch = global_step // (len(dataset)//batch))
        try:
            steps_per_epoch = len(loader)
        except TypeError:
            steps_per_epoch = 0
        epoch = step // steps_per_epoch if steps_per_epoch > 0 else 0
        while step < tot:
            for batch in loader:
                t0 = time.time()
                step += 1
                rng, sub = jax.random.split(rng)
                device_batch = shard_batch(
                    self.mesh,
                    {k: batch[k] for k in self.batch_keys if k in batch})
                state, metrics = step_fn(state, device_batch, sub)

                if step % cfg.cal_step == 0:
                    m = jax.device_get(metrics)
                    mse = float(m["mse_loss"])
                    meters["elapsed"].update(time.time() - t0)
                    meters["loss"].update(float(m["rd_loss"]))
                    meters["bpp"].update(float(m["bpp"]))
                    meters["bpp_y"].update(float(m["bpp_y"]))
                    meters["bpp_z"].update(float(m["bpp_z"]))
                    meters["mse"].update(mse)
                    meters["psnr"].update(
                        10 * np.log10(1.0 / mse) if mse > 0 else 100.0)
                if step % cfg.print_freq == 0:
                    lr = cfg.lr_at(step)
                    if tb_writer is not None:
                        tb_writer.add_scalar("lr", lr, step)
                        tb_writer.add_scalar("rd_loss", meters["loss"].avg, step)
                        tb_writer.add_scalar("psnr", meters["psnr"].avg, step)
                        tb_writer.add_scalar("bpp", meters["bpp"].avg, step)
                    logger.info(
                        " | ".join([
                            f"Step [{step}/{tot}={step / tot * 100:.2f}%]",
                            f"Epoch {epoch}",
                            f"Time {meters['elapsed'].val:.3f} ({meters['elapsed'].avg:.3f})",
                            f"Lr {lr}",
                            f"Total Loss {meters['loss'].val:.3f} ({meters['loss'].avg:.3f})",
                            f"PSNR {meters['psnr'].val:.3f} ({meters['psnr'].avg:.3f})",
                            f"Bpp {meters['bpp'].val:.5f} ({meters['bpp'].avg:.5f})",
                            f"Bpp_feature {meters['bpp_y'].val:.5f} ({meters['bpp_y'].avg:.5f})",
                            f"Bpp_z {meters['bpp_z'].val:.5f} ({meters['bpp_z'].avg:.5f})",
                            f"MSE {meters['mse'].val:.5f} ({meters['mse'].avg:.5f})",
                        ]))
                if step % cfg.snapshot_freq == 0:
                    save_rotating(state.params, self.save_path, step,
                                  cfg.snapshot_freq, self.snapshot_keep_after)
                    if self.image_dump_dir:
                        self._dump_images(state, batch, step)
                if step % cfg.save_model_freq == 0:
                    save_checkpoint(state.params, self.save_path, step)
                    if eval_fn is not None:
                        eval_fn(step, state)
                if step >= tot:
                    break
            epoch += 1
        save_checkpoint(state.params, self.save_path, step)
        return state


    def _dump_images(self, state, batch, step):
        """Periodic recon snapshots like trainRGB.py:240-247 /
        trainmask.py (every snapshot interval)."""
        import os
        from PIL import Image
        os.makedirs(self.image_dump_dir, exist_ok=True)
        arrs = self._render_recon(state, batch)
        for suffix, arr in arrs.items():
            arr8 = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            mode = {1: "L", 3: "RGB", 4: "RGBA"}[arr8.shape[-1]]
            img = arr8[..., 0] if mode == "L" else arr8
            Image.fromarray(img, mode).save(
                os.path.join(self.image_dump_dir, f"{step}{suffix}.png"))

    def _render_recon(self, state, batch) -> dict:
        raise NotImplementedError


class MaskTrainer(Trainer):
    def __init__(self, cfg: TrainConfig, save_path: str, model=None, **kw):
        # cfg.compute_dtype selects the training policy ("bfloat16" = bf16
        # activations, "float32" = fp32 + HIGHEST precision — the parity
        # preset); an explicitly passed model keeps its own policy
        model = model if model is not None else MaskCodec(
            policy=policy_from_str(cfg.compute_dtype))
        super().__init__(model, cfg, _mask_loss_fn(model, cfg), save_path,
                         snapshot_keep_after=595_000, **kw)
        self.batch_keys = ("alpha",)

    def _init_params(self, rng, batch):
        variables = self.model.init(
            {"params": rng, "noise": rng}, jnp.asarray(batch["alpha"]),
            training=True)
        return variables["params"]

    def _render_recon(self, state, batch):
        if self._dump_fn is None:
            self._dump_fn = jax.jit(lambda p, m: jnp.clip(self.model.apply(
                {"params": p}, m, training=False)["x_hat"], 0, 1))
        recon = jax.device_get(self._dump_fn(
            state.params, jnp.asarray(batch["alpha"][:1])))
        return {"mask": recon[0]}


class RGBTrainer(Trainer):
    def __init__(self, cfg: TrainConfig, save_path: str, model=None, **kw):
        model = model if model is not None else RGBCodec(
            policy=policy_from_str(cfg.compute_dtype))
        super().__init__(model, cfg, _rgb_loss_fn(model, cfg), save_path,
                         snapshot_keep_after=1_495_000, **kw)
        self.batch_keys = ("masked_image", "alpha")

    def _init_params(self, rng, batch):
        mask = jnp.asarray(batch["alpha"])
        x = jnp.asarray(batch["masked_image"])
        me = mask_pyramid(mask)
        variables = self.model.init({"params": rng, "noise": rng},
                                    x, mask, mask, me, training=True)
        return variables["params"]

    def _render_recon(self, state, batch):
        if self._dump_fn is None:
            def fwd(p, x, m):
                me = mask_pyramid(m)
                out = self.model.apply({"params": p}, x, m, m, me,
                                       training=False)
                return jnp.clip(out["x_hat"], 0, 1)
            self._dump_fn = jax.jit(fwd)
        x = jnp.asarray(batch["masked_image"][:1])
        m = jnp.asarray(batch["alpha"][:1])
        recon = jax.device_get(self._dump_fn(state.params, x, m))
        rgba = np.concatenate([recon[0], np.asarray(m[0])], axis=-1)
        return {"image": rgba, "mask": np.asarray(m[0])}

    def train(self, loader, state, tb_writer=None, eval_fn=None,
              max_steps=None):
        """Wrap the loader with the curriculum: before curriculum_step the
        full image replaces the masked input and the mask is all-ones
        (trainRGB.py:172-174)."""
        outer = self

        class CurriculumLoader:
            def __init__(self, inner):
                self.inner = inner
                self.step_ref = [int(state.step)]

            def __iter__(self):
                for batch in self.inner:
                    self.step_ref[0] += 1
                    if self.step_ref[0] < outer.cfg.curriculum_step:
                        batch = dict(batch)
                        batch["masked_image"] = batch["image"]
                        batch["alpha"] = np.ones_like(batch["alpha"])
                    yield batch

            def __len__(self):
                return len(self.inner)

        return super().train(CurriculumLoader(loader), state, tb_writer,
                             eval_fn, max_steps)
