"""Optimizer + train state with the reference's exact semantics.

* Adam(base_lr) with piecewise-constant step decay
  (trainRGB.py:142-155,379; trainmask.py:337-341)
* gradient VALUE clipping to [-5, 5] applied before Adam
  (clip_gradient, trainRGB.py:190-195 — clamp, not norm clip)
* the entropy-bottleneck ``quantiles`` are excluded from the main
  optimizer and trained by a separate aux Adam on ``aux_loss`` (compressai
  convention; the reference driver never steps them — set aux_lr=0 for
  strict parity, SURVEY §2.2 P3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import TrainConfig


def _is_quantiles(path) -> bool:
    return any(getattr(k, "key", None) == "quantiles" for k in path)


def quantile_mask(params, invert: bool = False):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_quantiles(path) ^ invert, params)


def lr_schedule_fn(cfg: TrainConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Jittable piecewise-constant schedule matching TrainConfig.lr_at."""

    def fn(step):
        step = jnp.asarray(step)
        lr = jnp.full_like(step, cfg.base_lr, dtype=jnp.float32)
        if cfg.warmup_step > 0:
            lr = jnp.where(step < cfg.warmup_step,
                           cfg.base_lr * step / cfg.warmup_step, lr)
        lr = jnp.where(step >= cfg.decay_interval,
                       cfg.base_lr * cfg.lr_decay, lr)
        if cfg.decay_interval2 is not None:
            lr = jnp.where(step >= cfg.decay_interval2,
                           cfg.base_lr * cfg.lr_decay2, lr)
        return lr

    return fn


@dataclasses.dataclass
class CodecTrainState:
    params: Any
    opt_state: Any
    aux_opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.aux_opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    CodecTrainState,
    CodecTrainState.tree_flatten,
    CodecTrainState.tree_unflatten,
)


def make_optimizers(cfg: TrainConfig):
    main_tx = optax.chain(
        optax.clip(cfg.grad_clip),                     # value clamp +-5
        optax.masked(optax.adam(lr_schedule_fn(cfg)),
                     lambda params: quantile_mask(params, invert=True)),
    )
    aux_tx = optax.masked(optax.adam(cfg.aux_lr if cfg.aux_lr > 0 else 1e-3),
                          lambda params: quantile_mask(params))
    return main_tx, aux_tx


def make_train_state(cfg: TrainConfig, params, step: int = 0) -> CodecTrainState:
    main_tx, aux_tx = make_optimizers(cfg)
    return CodecTrainState(
        params=params,
        opt_state=main_tx.init(params),
        aux_opt_state=aux_tx.init(params),
        step=jnp.asarray(step, jnp.int32),
    )


def make_train_step(cfg: TrainConfig, loss_fn, aux_loss_fn: Optional[Callable]):
    """Build the jittable train step.

    loss_fn(params, batch, rng) -> (rd_loss, metrics_dict)
    aux_loss_fn(params) -> scalar (bottleneck quantile loss) or None
    """
    run_aux = aux_loss_fn is not None and cfg.aux_lr > 0

    def step_fn(state: CodecTrainState, batch, rng, main_tx, aux_tx):
        (rd, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = main_tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)

        aux_opt_state = state.aux_opt_state
        if run_aux:
            aux_val, aux_grads = jax.value_and_grad(aux_loss_fn)(params)
            aux_updates, aux_opt_state = aux_tx.update(
                aux_grads, state.aux_opt_state, params)
            params = optax.apply_updates(params, aux_updates)
            metrics = dict(metrics, aux_loss=aux_val)

        new_state = CodecTrainState(params, opt_state, aux_opt_state,
                                    state.step + 1)
        metrics = dict(metrics, rd_loss=rd)
        return new_state, metrics

    return step_fn
