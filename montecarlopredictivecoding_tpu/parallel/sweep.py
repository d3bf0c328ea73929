"""Seed/model-replica sweeps as a vmapped axis.

The reference's neural-variability study loops sequentially over 10 seed
models (``/root/reference/figure_5.py:72-144``); here the seed axis becomes a
``jax.vmap`` dimension over the pure engine — S independent chains execute as
one batched computation (and shard over the 'data' mesh axis like any other
batch dimension).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ..core.engine import EngineConfig, EngineState, build_train_on_batch
from ..core.model import PCModel


def stack_pytrees(trees: tp.Sequence):
    """Stack a list of identically-structured pytrees along a new leading
    axis."""
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *trees)


def make_seed_states(
    model: PCModel,
    cfg: EngineConfig,
    params_list: tp.Sequence,
    inputs,
    key,
) -> EngineState:
    """Initialize and stack per-seed EngineStates (fresh latents + optimizer
    states per replica)."""
    n = len(params_list)
    keys = jax.random.split(key, 2 * n)
    states = []
    opt_x = cfg.optimizer_x.make()
    opt_p = cfg.optimizer_p.make() if cfg.optimizer_p is not None else None
    for i, params in enumerate(params_list):
        latents = model.init_latents(params, inputs, keys[i])
        xs_tree = {"latents": latents}
        states.append(
            EngineState(
                params=params,
                latents=latents,
                opt_x_state=opt_x.init(xs_tree),
                opt_p_state=opt_p.init(params) if opt_p is not None else None,
                lr_scale=jnp.ones(()),
                key=keys[n + i],
            )
        )
    return stack_pytrees(states)


def vmap_train_on_batch(model: PCModel, cfg: EngineConfig):
    """Jitted, seed-vmapped train_on_batch:
    fn(stacked_state, inputs, loss_kwargs) -> (stacked_state, stacked
    results).  ``inputs``/``loss_kwargs`` are shared across replicas."""
    fn = build_train_on_batch(model, cfg)
    return jax.jit(jax.vmap(fn, in_axes=(0, None, None)))
