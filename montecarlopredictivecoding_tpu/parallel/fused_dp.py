"""Data-parallel fused MCPC training over a device mesh.

Chains are embarrassingly parallel until the per-batch weight update, so the
multi-chip layout is: every chip runs the fused whole-chain kernel
(ops/pallas_mcpc.py — Adam warm start + Langevin + local Hebbian-gradient
accumulation) on its shard of the batch, and ONE ``psum`` over the 'data'
axis reduces the Monte-Carlo parameter gradients before the optimizer step.
That single collective per batch is the entire communication volume — the
TPU-native replacement for the distributed backend the reference never had
(SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.model import PCModel
from ..ops import mcpc_chain_pallas


def make_dp_fused_chain(
    model: PCModel,
    mesh: Mesh,
    *,
    T: int,
    lr: float,
    noise_var: tp.Optional[float],
    loss: str,
    input_var: float = 1.0,
    mixing: int = 0,
    with_pgrads: bool = True,
    warm_T: int = 0,
    warm_lr: float = 0.1,
    interpret: bool = False,
    axis: str = "data",
    matmul_layout: str = "auto",
    jit_compile: bool = True,
):
    """Build a jitted data-parallel fused chain:

        fn(params, latents, target, seed) -> (latents', psummed pgrads)

    ``latents``/``target`` shard over ``axis``; params replicate; each shard
    seeds its PRNG with ``fold_in(seed, axis_index)``.

    ``jit_compile=False`` returns the shard-mapped fn un-jitted so a caller
    can embed it inside a larger jitted program (e.g. the epoch trainer's
    K-batch ``lax.scan`` chunk, ``experiments/train_mnist.py``) and pay one
    compile for the whole step instead of one per call.
    """

    def shard_body(params, latents, target, seed):
        idx = jax.lax.axis_index(axis)
        shard_seed = seed + idx * jnp.int32(1000003)  # distinct PRNG per shard
        out = mcpc_chain_pallas(
            params, latents, target, shard_seed,
            T=T, lr=lr, noise_var=noise_var, loss=loss, input_var=input_var,
            mixing=mixing, with_pgrads=with_pgrads,
            warm_T=warm_T, warm_lr=warm_lr,
            interpret=interpret, matmul_layout=matmul_layout,
        )
        new_latents, pgrads = out[0], out[1]
        if with_pgrads:
            # the only cross-chip communication: sum the local Hebbian
            # gradient accumulators (energies are sums over datapoints, so
            # shard-sums add exactly like a single big batch)
            pgrads = jax.lax.psum(pgrads, axis)
        return new_latents, pgrads

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded) if jit_compile else sharded


def place_dp(mesh: Mesh, params, latents, target, axis: str = "data"):
    """Device-put params replicated, latents/target sharded over ``axis``."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    params = jax.device_put(params, repl)
    latents = tuple(jax.device_put(x, shard) for x in latents)
    target = jax.device_put(target, shard)
    return params, latents, target
