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


def sweep_warm_langevin_chains(
    model: PCModel,
    params_list: tp.Sequence,
    config: dict,
    target,
    inputs,
    key,
    stride: int = 1,
    langevin_var: float = 2.0,
    loss_fn=None,
):
    """The figure-5 per-seed workload — PC warm start then an MCPC Langevin
    chain with thinned ``xs`` capture — executed for ALL seeds at once as a
    vmapped axis (replacing the reference's sequential Python seed loop,
    figure_5.py:72-144).

    Returns stacked captures ``xs`` (tuple of [S, n_cap, B, d] arrays).
    ``target=None`` runs the unclamped (spontaneous) chain.
    """
    from ..core.losses import zero_fn
    from ..core.optim import OptimizerSpec
    from ..core.schedule import build_plan

    if loss_fn is None:
        loss_fn = config["loss_fn"] if target is not None else zero_fn
    kwargs = {"_target": target} if target is not None else {}
    if config.get("input_var") is not None:
        kwargs["_var"] = config["input_var"]

    cfg_pc = EngineConfig(
        plan=build_plan(config["T_pc"], "all", "never"),
        optimizer_x=OptimizerSpec.from_torch_style(
            config["optimizer_x_fn_pc"], config["optimizer_x_kwargs_pc"]
        ),
        optimizer_p=None,
        loss_fn=loss_fn,
        capture_every_t=False,
    )
    T_mc = config["mixing"] + config["sampling"]
    cfg_mc = EngineConfig(
        plan=build_plan(T_mc, "all", "never"),
        optimizer_x=OptimizerSpec("sgd", **config["optimizer_x_kwargs_mcpc"]),
        optimizer_p=None,
        langevin_var=langevin_var,
        loss_fn=loss_fn,
        capture_every_t=True,
        capture_xs=True,
        capture_stride=stride,
    )

    warm_state = make_seed_states(model, cfg_pc, params_list, inputs, key)
    warm_fn = vmap_train_on_batch(model, cfg_pc)
    warm_state, _ = warm_fn(warm_state, inputs, kwargs)

    # hand the warmed latents to the Langevin chain (the reference's shared
    # PCLayer._x state between the two trainers, utils/model.py:121-149)
    n = len(params_list)
    opt_x_mc = cfg_mc.optimizer_x.make()
    chain_state = EngineState(
        params=warm_state.params,
        latents=warm_state.latents,
        opt_x_state=jax.vmap(lambda lat: opt_x_mc.init({"latents": lat}))(
            warm_state.latents
        ),
        opt_p_state=None,
        lr_scale=jnp.ones((n,)),
        key=jax.vmap(lambda k: jax.random.fold_in(k, 1))(warm_state.key),
    )
    chain_fn = vmap_train_on_batch(model, cfg_mc)
    _, results = chain_fn(chain_state, inputs, kwargs)
    return results["xs"]
