"""MNIST training entry points — the producers missing from the reference.

The reference ships 28 pre-trained checkpoints but no script that creates
them (SURVEY.md §2.3 "missing-asset gaps"); only the trainer factories with
``training=True`` paths exist (utils/training_evaluation.py:16-70).  The
per-batch schedule here follows the workload the reference documents for
training: a PC warm start followed by an MCPC chain whose sampling window
accumulates the Monte-Carlo weight gradient (250 PC + 50 mixing + 100
sampling per batch, table_1.py:38-44 scale), or pure PC for the PC models.

Usage:
    python -m montecarlopredictivecoding_tpu.experiments.train_mnist \
        --model mcpc --epochs 10 --out models/mcpc_fid_1.msgpack
    python -m ...train_mnist --model pc|dlgm|resnet9
    python -m ...train_mnist --model mcpc --snapshot-epochs 0 5 10 15 30 35 \
        --out models/epoch_save/mcpc_aging_0   # developmental study snapshots
"""

from __future__ import annotations

import argparse
import os
import time
import typing as tp

import jax.numpy as jnp
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from ..data import get_mnist_data
from ..models.factory import get_mcpc_trainer, get_model, get_pc_trainer
from ..utils.checkpoint import save_checkpoint


def apply_preset(config: dict, preset: str, model: str) -> dict:
    """Per-metric architecture presets matching the reference checkpoints
    (table_1.py / figure_4.py configs): 'fid'/'ml' use the standard
    20-128-128-784 stack; 'mse' uses the reconstruction architectures
    (MCPC 10-256-256-784 relu, PC 30-256-256-784 tanh)."""
    if preset == "mse":
        if model == "mcpc":
            config.update(input_size=10, hidden_size=256, hidden2_size=256)
        elif model == "pc":
            config.update(
                input_size=30, hidden_size=256, hidden2_size=256,
                activation_fn="tanh",
            )
    elif preset == "ml":
        # reference table_1.py:196-225: MCPC keeps the standard stack; the
        # PC ml models are 25-128-128-784 tanh
        if model == "pc":
            config.update(input_size=25, activation_fn="tanh")
    return config


def mcpc_training_config() -> dict:
    return {
        "batch_size_train": 256,
        "batch_size_val": 1024,
        "batch_size_test": 1024,
        "input_size": 20,
        "hidden_size": 128,
        "hidden2_size": 128,
        "output_size": 784,
        "loss_fn": mcpc.bernoulli_fn,
        "activation_fn": "relu",
        "input_var": None,
        "T_pc": 250,
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.7},
        "mixing": 50,
        "sampling": 100,
        "optimizer_x_kwargs_mcpc": {"lr": 0.1},
        "optimizer_p_fn_mcpc": "adam",
        "optimizer_p_kwargs_mcpc": {"lr": 0.01},
    }


def pc_training_config() -> dict:
    return {
        "batch_size_train": 128,
        "batch_size_val": 1024,
        "batch_size_test": 1024,
        "input_size": 20,
        "hidden_size": 128,
        "hidden2_size": 128,
        "output_size": 784,
        "loss_fn": mcpc.bernoulli_fn,
        "activation_fn": "relu",
        "input_var": None,
        "T_pc": 250,
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.1},
        "optimizer_p_fn": "adam",
        "optimizer_p_kwargs": {"lr": 0.001},
    }


def train_mcpc(
    epochs: int,
    out: str,
    seed: int = 0,
    snapshot_epochs=(),
    batches_per_epoch=None,
    log: bool = True,
    fused: tp.Optional[bool] = None,
    preset: str = "fid",
    mesh: tp.Optional[int] = None,
    langevin_var: tp.Optional[float] = 2.0,
):
    """MCPC MNIST training: per batch, PC warm start (update_p never) then an
    MCPC chain with the Monte-Carlo-accumulated weight update — the canonical
    pattern (reference utils/model.py:121-149 with training factories).

    On TPU (``fused=None`` -> auto) the whole per-batch pipeline — Adam MAP
    warm start, Langevin chain, Hebbian gradient accumulation — runs as ONE
    fused Pallas kernel dispatch (ops/pallas_mcpc.py ``warm_T`` phase).

    ``mesh=N`` trains data-parallel over an N-device mesh: every device runs
    the fused kernel on its batch shard and the per-batch Monte-Carlo weight
    gradient is reduced with ONE ``psum`` before the replicated Adam step
    (parallel/fused_dp.py).  Requires the fused path; batches whose size
    doesn't divide N are skipped (counted and reported).

    ``langevin_var`` is the Langevin noise variance (the reference's
    ``LangevinStep(var=2.0)``, utils/model.py:121-149); ``None`` disables the
    noise, turning the chain deterministic — used by the dp==single-device
    equivalence test, and the knob an ablation would use.
    """
    import jax

    config = apply_preset(mcpc_training_config(), preset, "mcpc")
    train, _, _ = get_mnist_data(config, seed=seed)
    gen = get_model(config, key=seed)
    if fused is None:
        fused = jax.default_backend() == "tpu" or mesh is not None
    if mesh is not None and not fused:
        raise ValueError("mesh training requires the fused kernel path")

    skipped_batches = 0
    if fused:
        import optax

        from ..ops import mcpc_chain_pallas

        opt_p = optax.adam(config["optimizer_p_kwargs_mcpc"]["lr"])
        opt_p_state = opt_p.init(gen.params)
        mixing, sampling = config["mixing"], config["sampling"]
        chain_kwargs = dict(
            T=mixing + sampling,
            lr=config["optimizer_x_kwargs_mcpc"]["lr"],
            noise_var=langevin_var, loss="bernoulli",
            mixing=mixing, with_pgrads=True,
            warm_T=config["T_pc"],
            warm_lr=config["optimizer_x_kwargs_pc"]["lr"],
            interpret=jax.default_backend() != "tpu",
        )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.fused_dp import make_dp_fused_chain
            from ..parallel.mesh import make_mesh

            mesh_obj = make_mesh(jax.devices()[:mesh], data=mesh, model=1)
            dp_chain = make_dp_fused_chain(
                gen.model, mesh_obj, jit_compile=False, **chain_kwargs
            )
            repl = NamedSharding(mesh_obj, P())
            batch_sharding = NamedSharding(mesh_obj, P(None, "data"))
            gen.params = jax.device_put(gen.params, repl)
            opt_p_state = jax.device_put(opt_p_state, repl)

        def one_batch(params, opt_state, key, data):
            """Full per-batch training step, traceable: latent init, fused
            warm+chain kernel, Monte-Carlo Adam update."""
            k_lat, k_seed = jax.random.split(key)
            pseudo = jnp.zeros((data.shape[0], config["input_size"]))
            latents = gen.model.init_latents(params, pseudo, k_lat)
            seed_val = jax.random.randint(k_seed, (), 0, 2**31 - 1)
            if mesh is None:
                _, pgrads = mcpc_chain_pallas(
                    params, latents, data, seed_val, **chain_kwargs
                )
            else:
                # per-shard kernel + one psum of the Monte-Carlo grads —
                # pgrads come back as GLOBAL sums, so the normalization
                # below is identical to the single-device path
                _, pgrads = dp_chain(params, latents, data, seed_val)
            g = jax.tree_util.tree_map(
                lambda x: x / (sampling * data.shape[0]), pgrads
            )
            updates, opt_state = opt_p.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        @jax.jit
        def run_chunk(params, opt_state, key, data_k):
            """K batches in ONE dispatch (lax.scan over stacked data) — the
            tunneled chip pays ~5-30 ms of dispatch latency per host round
            trip, which otherwise dominates the ~3 ms per-batch compute."""

            def body(carry, data):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                params, opt_state = one_batch(params, opt_state, sub, data)
                return (params, opt_state, key), None

            (params, opt_state, key), _ = jax.lax.scan(
                body, (params, opt_state, key), data_k
            )
            return params, opt_state, key

        CHUNK = 16
        key_dev = gen.next_key()
    else:
        pc_warm = get_pc_trainer(gen, config, is_mcpc=True, training=True)
        mc = get_mcpc_trainer(gen, config, training=True)

    def snap(tag):
        path = out + (f"_epoch{tag}" if tag is not None else "")
        save_checkpoint(path if path.endswith(".msgpack") else path + ".msgpack", gen.params)

    if 0 in snapshot_epochs:
        snap("_init")
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        pending: list = []

        def flush():
            nonlocal pending, opt_p_state, key_dev
            while pending:
                # only stack equal-shaped batches (the loader's final batch
                # can be smaller); k stays in {CHUNK, 1} so each distinct
                # (k, batch) pair costs exactly one jit trace — the epoch
                # remainder runs one batch per dispatch, trading a few ms of
                # tunnel latency per epoch for not compiling a third variant
                k = CHUNK
                if len(pending) < CHUNK or any(
                    b.shape != pending[0].shape for b in pending[:CHUNK]
                ):
                    k = 1
                stack = jnp.stack(pending[:k])
                if mesh is not None:
                    stack = jax.device_put(stack, batch_sharding)
                gen.params, opt_p_state, key_dev = run_chunk(
                    gen.params, opt_p_state, key_dev, stack
                )
                pending = pending[k:]

        for i, (data, _) in enumerate(train):
            if batches_per_epoch is not None and i >= batches_per_epoch:
                break
            if fused:
                if mesh is not None and data.shape[0] % mesh != 0:
                    skipped_batches += 1  # shard axis must divide the batch
                    continue
                pending.append(jnp.asarray(data))
                if len(pending) >= CHUNK:
                    flush()
            else:
                pseudo = jnp.zeros((data.shape[0], config["input_size"]))
                pc_warm.train_on_batch(
                    pseudo,
                    loss_fn=config["loss_fn"],
                    loss_fn_kwargs={"_target": data},
                    is_return_results_every_t=False,
                )
                mc.train_on_batch(
                    pseudo,
                    loss_fn=config["loss_fn"],
                    loss_fn_kwargs={"_target": data},
                    callback_after_t=(
                        mcpc.LangevinStep(var=langevin_var)
                        if langevin_var is not None
                        else None
                    ),
                    is_sample_x_at_batch_start=False,
                    is_return_results_every_t=False,
                )
        if fused:
            flush()
            # sync via a scalar readback (block_until_ready is unreliable
            # over the tunnel) so the epoch timing is honest
            float(jnp.sum(gen.params[0]["b"]))
        if log:
            print(f"epoch {epoch}: {time.time() - t0:.1f}s")
        if epoch in snapshot_epochs:
            snap(epoch)
    if skipped_batches and log:
        print(
            f"mesh={mesh}: skipped {skipped_batches} batch(es) whose size "
            f"didn't divide the data axis"
        )
    if not snapshot_epochs:
        snap(None)
    return gen


def train_pc(epochs: int, out: str, seed: int = 0, batches_per_epoch=None, log=True,
             preset: str = "fid"):
    """PC MNIST training: T_pc MAP steps then one weight update per batch."""
    config = apply_preset(pc_training_config(), preset, "pc")
    train, _, _ = get_mnist_data(config, seed=seed)
    gen = get_model(config, key=seed)
    trainer = get_pc_trainer(gen, config, is_mcpc=False, training=True)
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        for i, (data, _) in enumerate(train):
            if batches_per_epoch is not None and i >= batches_per_epoch:
                break
            pseudo = jnp.zeros((data.shape[0], config["input_size"]))
            trainer.train_on_batch(
                pseudo,
                loss_fn=config["loss_fn"],
                loss_fn_kwargs={"_target": data},
                is_return_results_every_t=False,
            )
        if log:
            print(f"epoch {epoch}: {time.time() - t0:.1f}s")
    save_checkpoint(out if out.endswith(".msgpack") else out + ".msgpack", gen.params)
    return gen


def train_dlgm(epochs: int, out: str, seed: int = 0, log=True, preset: str = "fid"):
    from ..models.dlgm import DLGM

    config = {
        "loss_fn": mcpc.bernoulli_fn,
        "batch_size_train": 64,
        "batch_size_val": 1024,
        "batch_size_test": 1024,
    }
    train, _, _ = get_mnist_data(config, seed=seed)
    # reference table_1.py DLGM configs: fid/mse use hidden 256 / latent 20,
    # the ml models are hidden 128 / latent 10 (table_1.py:227-231)
    hidden, latent = (128, 10) if preset == "ml" else (256, 20)
    dlgm = DLGM(input_dim=784, hidden_dim=hidden, latent_dim=latent, factor_recog=1, key=seed)
    dlgm.train(train, epochs=epochs, log=log)
    save_checkpoint(
        out if out.endswith(".msgpack") else out + ".msgpack",
        (dlgm.gen_params, dlgm.rec_params),
    )
    return dlgm


def train_resnet9_entry(epochs: int, out: str, seed: int = 0, is_mask: bool = False):
    from flax import serialization

    from ..models.resnet9 import train_resnet9

    config = {
        "loss_fn": mcpc.bernoulli_fn,
        "batch_size_train": 128,
        "batch_size_val": 1024,
        "batch_size_test": 1024,
    }
    train, _, _ = get_mnist_data(config, seed=seed)
    model, state = train_resnet9(train, epochs=epochs, is_mask=is_mask, log_every=100)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    path = out if out.endswith(".msgpack") else out + ".msgpack"
    with open(path, "wb") as f:
        f.write(
            serialization.to_bytes(
                {"params": state.params, "batch_stats": state.batch_stats}
            )
        )
    return model, state


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["mcpc", "pc", "dlgm", "resnet9", "resnet9_mask"], required=True)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batches-per-epoch", type=int, default=None)
    p.add_argument("--snapshot-epochs", type=int, nargs="*", default=[])
    p.add_argument("--preset", choices=["fid", "ml", "mse"], default="fid",
                   help="architecture preset matching the reference checkpoint families")
    p.add_argument("--mesh", type=int, default=None,
                   help="data-parallel training over an N-device mesh "
                        "(MCPC only; per-shard fused kernel + one grad psum)")
    args = p.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    if args.model == "mcpc":
        train_mcpc(
            args.epochs,
            args.out,
            seed=args.seed,
            snapshot_epochs=tuple(args.snapshot_epochs),
            batches_per_epoch=args.batches_per_epoch,
            preset=args.preset,
            mesh=args.mesh,
        )
    elif args.mesh is not None:
        p.error("--mesh is only supported for --model mcpc")
    elif args.model == "pc":
        train_pc(args.epochs, args.out, seed=args.seed,
                 batches_per_epoch=args.batches_per_epoch, preset=args.preset)
    elif args.model == "dlgm":
        train_dlgm(args.epochs, args.out, seed=args.seed, preset=args.preset)
    else:
        train_resnet9_entry(
            args.epochs, args.out, seed=args.seed, is_mask=args.model.endswith("mask")
        )


if __name__ == "__main__":
    main()
