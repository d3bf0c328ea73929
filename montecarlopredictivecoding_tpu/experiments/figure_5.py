"""Figure 5 — neural variability (reference ``/root/reference/figure_5.py``).

(b) KL(spontaneous ‖ evoked) latent activity across training epochs for
    natural / grating / noise stimuli (10 seeds x epoch snapshots), compared
    with Berkes et al. 2011;
(a) variability quenching at stimulus onset (rolling-window variance of the
    latents) for MCPC and PC, compared with Churchland et al. 2010.
"""

from __future__ import annotations

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

import montecarlopredictivecoding_tpu as mcpc
from ..data import get_mnist_data, grating_dataset, noise_dataset
from ..eval.metrics import KLdivergence, get_paired_stat
from ..models.factory import get_mcpc_trainer, get_pc_trainer
from ..utils.plotting import setup_fig
from .common import ExperimentContext, context_from_args, load_generative_checkpoint, standard_parser
from .neuro_data import BERKES_AGES, BERKES_KLS, BERKES_KLS_SEM_COORD, churchland_2010_curves


def _base_config(ctx: ExperimentContext) -> dict:
    """Reference figure_5.py:31-56 config."""
    return {
        "batch_size_train": 256,
        "batch_size_val": 1024,
        "batch_size_test": 256,
        "input_size": 20,
        "hidden_size": 128,
        "hidden2_size": 128,
        "output_size": 784,
        "loss_fn": mcpc.bernoulli_fn,
        "activation_fn": "relu",
        "input_var": None,
        "T_pc": ctx.steps(1000),
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.7},
        "mixing": ctx.steps(500),
        "sampling": ctx.steps(9500),
        "optimizer_x_kwargs_mcpc": {"lr": 0.05},
    }


def _sample_latent_chain(ctx, gen, config, target, neuron_idx, stride):
    """PC warm start + MCPC chain; returns the deepest latent's activity at
    the selected neurons, post-burn-in, flattened over (time, batch)
    (reference figure_5.py:103-137)."""
    pc_trainer = get_pc_trainer(gen, config, is_mcpc=True, training=False)
    mcpc_trainer = get_mcpc_trainer(gen, config, training=False)
    mcpc_trainer.use_pallas_capture = True  # kernel-speed trajectories on TPU
    batch = config["batch_size_test"]
    pseudo = jnp.zeros((batch, config["input_size"]))
    if target is None:
        loss_fn, kwargs = mcpc.zero_fn, {}
    else:
        loss_fn, kwargs = config["loss_fn"], {"_target": target}
    pc_trainer.train_on_batch(pseudo, loss_fn=loss_fn, loss_fn_kwargs=kwargs,
                              is_return_results_every_t=False)
    res = mcpc_trainer.train_on_batch(
        pseudo, loss_fn=loss_fn, loss_fn_kwargs=kwargs,
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False, is_return_xs=True,
        capture_stride=stride,
    )
    xs_deep = np.asarray(res["xs"][2])  # deepest hidden latent [T/stride, B, d]
    post = xs_deep[config["mixing"] // stride:]
    return post[:, :, neuron_idx].reshape(-1, len(neuron_idx))


def similarity_increase_digit(ctx: ExperimentContext, ax=None,
                              epochs=(0, 5, 10, 15), seeds=range(10),
                              data=None):
    """KL(spontaneous ‖ evoked) across training epochs
    (reference figure_5.py:24-216)."""
    config = _base_config(ctx)
    rng = np.random.RandomState(1)
    neuron_idx = rng.choice(config["hidden2_size"], 5, replace=False)
    stride = max((config["mixing"] + config["sampling"]) // 500, 1)
    indent = 1  # post-capture thinning handled by capture_stride

    if data is None:
        from ..models.factory import get_model
        from ..parallel.sweep import sweep_warm_langevin_chains

        _, _, test_loader = get_mnist_data(config)
        natural, _ = next(iter(test_loader))
        gratings = jnp.asarray(grating_dataset(config["batch_size_test"], num_orientations=16))
        noise = jnp.asarray(noise_dataset(config["batch_size_test"]))

        # The seed axis runs as a vmapped sweep (parallel/sweep.py) instead
        # of the reference's sequential Python loop (figure_5.py:72-144):
        # one batched chain per (epoch, stimulus) covers every seed at once
        # and shards over the 'data' mesh axis like any batch dimension.
        seeds = list(seeds)
        base_model = get_model(config, key=0).model
        pseudo = jnp.zeros((config["batch_size_test"], config["input_size"]))
        kls_np = np.zeros((3, len(epochs), len(seeds)))
        stimuli = ((0, None), (1, natural), (2, noise), (3, gratings))
        for ei, epoch in enumerate(epochs):
            params_list = []
            for seed in seeds:
                name = f"epoch_save/mcpc_aging_{seed}_" + (
                    f"epoch{epoch}" if epoch != 0 else "epoch_init"
                )
                gen = load_generative_checkpoint(ctx, name, config)
                params_list.append(gen.params)
            chains = {}
            for li, tgt in stimuli:
                xs = sweep_warm_langevin_chains(
                    base_model, params_list, config, tgt, pseudo,
                    ctx.key(500 + 11 * ei + li), stride=stride,
                )
                deep = np.asarray(xs[2])  # [S, n_cap, B, d]
                post = deep[:, config["mixing"] // stride :, :, :]
                post = post[:, :, :, neuron_idx]
                chains[li] = post.reshape(len(seeds), -1, len(neuron_idx))
            for si in range(len(seeds)):
                prior = chains[0][si]
                sub = max(len(prior) // 2000, 1)
                kls_np[0, ei, si] = KLdivergence(prior[::sub], chains[1][si, ::sub])
                kls_np[1, ei, si] = KLdivergence(prior[::sub], chains[2][si, ::sub])
                kls_np[2, ei, si] = KLdivergence(prior[::sub], chains[3][si, ::sub])
    else:
        kls_np = data

    kls_mean = kls_np.mean(-1)
    # Preserved upstream quirk (PARITY.md "Preserved quirks"): the reference
    # computes "s.e.m." as std/n, not std/sqrt(n) (figure_5.py:153); kept
    # verbatim so the error bars match the published figure.
    kls_sem = kls_np.std(-1) / kls_np.shape[-1]

    plot = ax is None
    if plot:
        fig, ax = plt.subplots()
    types = ["natural ", "noise", "gratings"]
    index = np.arange(len(epochs))
    bw = 0.2
    for i, t in enumerate(types):
        ax.bar(index + i * bw, kls_mean[i], bw, label=t, color=f"C{i}",
               yerr=[np.zeros_like(kls_sem[i]) + 0.05, kls_sem[i]], zorder=2,
               error_kw=dict(capsize=4, zorder=1))
    ax.set_xlabel("epoch")
    ax.set_ylabel("KL divergence")
    ax.set_xticks(index + bw)
    ax.set_xticklabels([str(e) for e in epochs])

    if kls_np.shape[2] > 2:
        for j, other in enumerate((1, 2)):
            p = get_paired_stat(kls_np[0, -1, :], kls_np[other, -1, :], type="less")
            stars = "***" if p < 0.001 else "**" if p < 0.01 else "*" if p < 0.05 else f"{p:.2e}"
            x1, x2 = len(epochs) - 1, len(epochs) - 1 + (j + 1) * bw
            y = (kls_mean + kls_sem)[:, -1].max() + 0.1 + 0.4 * j
            ax.plot([x1, x1, x2, x2], [y, y + 0.1, y + 0.1, y], lw=1.5, c="k")
            ax.text((x1 + x2) * 0.5, y + 0.1, stars, ha="center", va="bottom")
        ax.set_ylim(bottom=0)
    if plot:
        plt.savefig(ctx.fig_path("5b_digit.svg"))
        plt.close()
    return kls_np


def berkes_2011(ax=None):
    """Published comparison panel (reference figure_5.py:218-267)."""
    sem = BERKES_KLS_SEM_COORD - BERKES_KLS
    plot = ax is None
    if plot:
        fig, ax = plt.subplots()
    index = np.arange(len(BERKES_AGES))
    bw = 0.2
    for i, t in enumerate(["natural stimuli", "noise", "gratings"]):
        ax.bar(index + i * bw, BERKES_KLS[:, i], bw, label=t, color=f"C{i}",
               yerr=[np.zeros_like(sem[:, i]) + 50, sem[:, i]], zorder=2,
               error_kw=dict(capsize=4, zorder=1))
    ax.set_xlabel("postnatal age (days)")
    ax.set_ylabel("KL divergence")
    ax.set_xticks(index + bw)
    ax.set_xticklabels(BERKES_AGES)
    ax.legend()
    if plot:
        plt.show()
    return ax


def _rolling_variability(xs_flat: np.ndarray, window: int):
    """Rolling-window std of concatenated chains, averaged over units —
    the reference's pandas rolling computation (figure_5.py:336-361)."""
    series = pd.DataFrame(xs_flat)  # [time, units]
    moving_std = series.rolling(window=window).std()
    mean = moving_std.mean(axis=1).values
    sem = moving_std.std(axis=1).values / np.sqrt(xs_flat.shape[1])
    return mean, sem


def variability_stimulus_onset_nonlinear(ctx: ExperimentContext, axs,
                                         mode: str = "mcpc"):
    """Variance of latent activity before/after stimulus onset
    (reference figure_5.py:269-371 for MCPC, :373-469 for PC): run an
    unclamped chain, then a clamped chain from the same state; the rolling
    variance drops at onset for MCPC."""
    config = _base_config(ctx)
    config["batch_size_test"] = 100 if mode == "pc" else 256
    config["input_var"] = 0.3
    config["mixing"] = 0
    config["sampling"] = ctx.steps(8000)
    config["optimizer_x_kwargs_mcpc"] = {"lr": 0.05}
    config["T_pc"] = ctx.steps(8000) if mode == "pc" else ctx.steps(250)
    if mode == "pc":
        config["optimizer_x_kwargs_pc"] = {"lr": 0.05}

    gen = load_generative_checkpoint(ctx, "mcpc_fid_1", config)
    _, _, test_loader = get_mnist_data(config)
    data, _ = next(iter(test_loader))
    batch = data.shape[0]
    pseudo = jnp.zeros((batch, config["input_size"]))
    stride = max(config["sampling"] // 2000, 1)

    if mode == "mcpc":
        pc_tr = get_pc_trainer(gen, config, is_mcpc=True, training=False)
        mc_tr = get_mcpc_trainer(gen, config, training=False)
        pc_tr.train_on_batch(pseudo, loss_fn=None, is_return_results_every_t=False)
        mc_tr.train_on_batch(
            pseudo, loss_fn=None,
            callback_after_t=mcpc.LangevinStep(var=2.0),
            is_sample_x_at_batch_start=False, is_return_results_every_t=False,
        )
        res_no = mc_tr.train_on_batch(
            pseudo, loss_fn=mcpc.zero_fn, loss_fn_kwargs={},
            callback_after_t=mcpc.LangevinStep(var=2.0),
            is_sample_x_at_batch_start=False, is_return_xs=True, capture_stride=stride,
        )
        res_in = mc_tr.train_on_batch(
            pseudo, loss_fn=config["loss_fn"],
            loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
            callback_after_t=mcpc.LangevinStep(var=2.0),
            is_sample_x_at_batch_start=False, is_return_xs=True, capture_stride=stride,
        )
        lr = config["optimizer_x_kwargs_mcpc"]["lr"]
        color, label = "C0", "MCPC"
    else:
        pc_tr = get_pc_trainer(gen, config, is_mcpc=False, training=False)
        pc_tr.train_on_batch(pseudo, loss_fn=None, is_return_results_every_t=False)
        res_no = pc_tr.train_on_batch(
            pseudo, loss_fn=mcpc.zero_fn, loss_fn_kwargs={},
            is_sample_x_at_batch_start=False, is_return_xs=True, capture_stride=stride,
        )
        res_in = pc_tr.train_on_batch(
            pseudo, loss_fn=config["loss_fn"],
            loss_fn_kwargs={"_target": data},
            is_sample_x_at_batch_start=False, is_return_xs=True, capture_stride=stride,
        )
        lr = config["optimizer_x_kwargs_pc"]["lr"]
        color, label = "r", "PC"

    # concatenate all latents over units: [time, B * sum(dims)]
    def flat(res):
        return np.concatenate(
            [np.asarray(x).reshape(np.asarray(x).shape[0], -1) for x in res["xs"]],
            axis=1,
        )

    xs = np.concatenate([flat(res_no), flat(res_in)], axis=0)
    # reference rolling window is 1000 raw steps (figure_5.py:345); clamp so
    # scaled-down smoke runs still produce a defined rolling variance
    window = max(min(1000 // stride, xs.shape[0] // 4), 2)
    mean, sem = _rolling_variability(xs, window)
    time = np.linspace(0, len(mean) * lr * stride, len(mean)) - 203

    axs.plot(time, mean, color, linewidth=2, label=label)
    axs.fill_between(time, mean + sem, mean - sem, alpha=0.2, color=color)
    onset = len(flat(res_no)) * lr * stride - 203
    axs.vlines(onset, np.nanmin(mean - sem) - 0.1, np.nanmax(mean + sem) + 0.1,
               linestyles="dashed", colors="grey", linewidth=2.0)
    axs.set_xlabel("time (AU)")
    axs.set_ylabel(r"variance of $x$")
    axs.set_xlim(0, 600)
    axs.legend()
    return mean, sem


def churchland_2010(axs=None):
    """Published comparison panel (reference figure_5.py:471-509)."""
    plot = axs is None
    if plot:
        fig, axs = plt.subplots()
    mx, m, spx, sp, snx, sn, onset = churchland_2010_curves()
    t0 = min(mx.min(), spx.min(), snx.min())
    axs.plot(mx - t0, m, "k", linewidth=2, label="membrane potential")
    # the digitized SEM envelopes live on different (irregular) time grids —
    # close them into one polygon, as the reference does (figure_5.py:497-500)
    from matplotlib.patches import Polygon

    verts = [(x - t0, y) for x, y in zip(spx, sp)] + [
        (x - t0, y) for x, y in zip(snx[::-1], sn[::-1])
    ]
    axs.add_patch(Polygon(verts, facecolor="k", alpha=0.2))
    axs.vlines(onset - t0, 7, 17, linestyles="dashed", colors="grey",
               linewidth=2.0, label="stimulus onset")
    axs.set_xlabel("time (ms)")
    axs.set_ylabel(r"variance of $V_m$ $(mV^2)$")
    axs.set_xlim(0, 600)
    axs.set_ylim(7.65, 16.47)
    axs.legend()
    if plot:
        plt.show()
    return axs


def similarity_increase(ctx: ExperimentContext, **kwargs):
    setup_fig()
    f, axs = plt.subplots(2, 1, figsize=(5.8, 4.8))
    berkes_2011(axs[0])
    similarity_increase_digit(ctx, axs[1], **kwargs)
    plt.tight_layout()
    plt.savefig(ctx.fig_path("5b.svg"))
    plt.close()


def variability_quenching(ctx: ExperimentContext):
    setup_fig()
    f, axs = plt.subplots(3, 1, figsize=(5.8, 4.8))
    churchland_2010(axs[0])
    variability_stimulus_onset_nonlinear(ctx, axs[1], mode="mcpc")
    variability_stimulus_onset_nonlinear(ctx, axs[2], mode="pc")
    plt.tight_layout()
    plt.savefig(ctx.fig_path("5a.svg"))
    plt.close()


if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    ctx = context_from_args(args)
    variability_quenching(ctx)
    if args.full:
        # full developmental study: every seed, every shipped epoch snapshot
        # (the reference's models/epoch_save axis runs to epoch 35,
        # figure_5.py:74,92-93 assets)
        similarity_increase(ctx, seeds=range(10), epochs=(0, 5, 10, 15, 30, 35))
    else:
        similarity_increase(ctx, seeds=range(3))
