"""Sharding rules for PC stacks over a ``(data, model)`` mesh.

Layout: batch/chains shard over ``data``; each Linear's output features (and
therefore each latent's feature dim) shard over ``model`` when divisible.
With this layout the T-step inference scan needs exactly one collective per
step and layer boundary (an all-gather/reduce of the [B, d] activations when
the next layer's weights are feature-sharded), and the Monte-Carlo parameter
update reduces over the ``data`` axis — XLA inserts these from the sharding
annotations; there is no hand-written NCCL-style code to port (the reference
has none: SURVEY.md §2.2).
"""

from __future__ import annotations

import typing as tp

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.engine import EngineConfig, EngineState, build_train_on_batch
from ..core.model import PCModel
from ..core.modules import Linear


def _shardable(dim: int, mesh: Mesh, axis: str) -> bool:
    size = mesh.shape.get(axis, 1)
    return size > 1 and dim % size == 0


def param_shardings(model: PCModel, mesh: Mesh) -> tuple:
    """Per-Linear sharding: weights shard on the output-feature dim over
    'model' (row-parallel on the following matmul); biases likewise."""
    out = []
    for i in model.linear_indices:
        lin: Linear = model.modules[i]
        mspec = "model" if _shardable(lin.out_dim, mesh, "model") else None
        p = {"w": NamedSharding(mesh, P(None, mspec))}
        if lin.use_bias:
            p["b"] = NamedSharding(mesh, P(mspec))
        out.append(p)
    return tuple(out)


def latent_shardings(model: PCModel, mesh: Mesh, latents) -> tuple:
    """Latents shard batch over 'data' and features over 'model' when
    divisible."""
    out = []
    for x in latents:
        mspec = "model" if _shardable(x.shape[-1], mesh, "model") else None
        out.append(NamedSharding(mesh, P("data", mspec)))
    return tuple(out)


def shard_train_on_batch(
    model: PCModel,
    cfg: EngineConfig,
    mesh: Mesh,
    state: EngineState,
    inputs,
    loss_kwargs,
) -> tp.Tuple[tp.Callable, EngineState, tp.Any, tp.Any]:
    """Build a pjit-ed train_on_batch for the given mesh and place the state.

    Returns (jitted_fn, placed_state, placed_inputs, placed_loss_kwargs).
    The optimizer states inherit the sharding of the tensors they track via
    sharding propagation (we only pin params/latents/inputs).
    """
    fn = build_train_on_batch(model, cfg)

    p_sh = param_shardings(model, mesh)
    l_sh = latent_shardings(model, mesh, state.latents)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(
        mesh,
        P("data", "model" if _shardable(inputs.shape[-1], mesh, "model") else None),
    )

    placed_params = tuple(
        {k: jax.device_put(v, p_sh[i][k]) for k, v in p.items()}
        for i, p in enumerate(state.params)
    )
    placed_latents = tuple(
        jax.device_put(x, s) for x, s in zip(state.latents, l_sh)
    )
    placed_inputs = jax.device_put(inputs, data_sh)
    placed_kwargs = jax.tree_util.tree_map(
        lambda v: jax.device_put(
            v,
            NamedSharding(mesh, P("data"))
            if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1
            and v.shape[0] == inputs.shape[0]
            else repl,
        ),
        loss_kwargs,
    )

    # optimizer states are (re)initialized from the placed tensors so their
    # moments inherit the latent/param shardings via eager propagation
    xs_tree = {"latents": placed_latents}
    if cfg.optimize_inputs:
        xs_tree["inputs"] = placed_inputs
    opt_x_state = (
        cfg.optimizer_x.make().init(xs_tree)
        if state.opt_x_state is None
        else state.opt_x_state
    )
    opt_p_state = state.opt_p_state
    if opt_p_state is None and cfg.optimizer_p is not None:
        opt_p_state = cfg.optimizer_p.make().init(placed_params)

    placed_state = EngineState(
        params=placed_params,
        latents=placed_latents,
        opt_x_state=opt_x_state,
        opt_p_state=opt_p_state,
        lr_scale=jax.device_put(state.lr_scale, repl),
        key=jax.device_put(state.key, repl),
    )

    jitted = jax.jit(fn)
    return jitted, placed_state, placed_inputs, placed_kwargs
