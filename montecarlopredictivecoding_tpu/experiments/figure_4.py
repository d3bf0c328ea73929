"""Figure 4 — learning dynamics (reference ``/root/reference/figure_4.py``).

Analytic parameter-flow landscapes (quiver + nullclines) for MCPC and PC on
the 1-D model, trajectories of actual training runs overlaid, trained-model
density match, MNIST masked-image reconstruction grid (PC vs MCPC vs DLGM)
and sample grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from ..data import get_mnist_data
from ..eval.sampling import sample_pc
from ..models.factory import get_mcpc_trainer, get_pc_trainer
from ..utils.plotting import setup_fig
from .common import ExperimentContext, context_from_args, load_generative_checkpoint, standard_parser


# -- analytic landscapes (reference figure_4.py:20-86 and :167-231) -------------


def mcpc_landscape(ax, x_mean=1.0, x_var=5.0):
    """Expected MCPC parameter flow for the 1-D model: nullclines and fixed
    points at W = ±sqrt(var−1), mu = x_mean/W (reference figure_4.py:20-86)."""

    def w_dot(w, mu):
        return (1 / (1 + w**2) ** 2) * (
            w * (x_var + x_mean**2) + x_mean * mu * (1 - w**2) - w * mu**2 - w - w**3
        )

    def mu_dot(w, mu):
        return w * (x_mean - w * mu) / (w**2 + 1)

    w = np.arange(-10, 10.01, 0.01)
    W, MU = np.meshgrid(np.arange(-10, 11, 2), np.arange(-10, 11, 2))
    W_dot = w_dot(W, MU)
    MU_dot = mu_dot(W, MU)

    n_mu = x_mean / w
    with np.errstate(invalid="ignore", divide="ignore"):
        disc = ((w**2 - 1) * x_mean) ** 2 - 4 * w * (w**3 + w * (1 - x_var - x_mean**2))
        root = np.sqrt(disc)
        n_w_1 = (-(w**2 - 1) * x_mean + root) / (2 * w)
        n_w_2 = (-(w**2 - 1) * x_mean - root) / (2 * w)

    alpha = 0.5
    ax.quiver(W[W != 0], MU[W != 0], W_dot[W != 0] * 0.3, MU_dot[W != 0] * 0.3,
              color=[0.5, 0.5, 0.5], label=r"$\Delta \theta$")
    for sign in (w > 0, w < 0):
        ax.plot(w[sign], n_mu[sign], linewidth=1.6, color=[0, 0.5, 0, alpha])
        ax.plot(w[sign], n_w_1[sign], linewidth=1.6, color=[0.8, 0.6, 1.0, alpha])
        ax.plot(w[sign], n_w_2[sign], linewidth=1.6, color=[0.8, 0.6, 1.0, alpha])
    ax.scatter(
        np.sqrt(x_var - 1) * np.array([1, -1]),
        np.array([1, -1]) * x_mean / np.sqrt(x_var - 1),
        color="k", linewidth=2, facecolors="none", label="data",
    )
    return ax


def pc_landscape(ax, x_mean=1.0, x_var=5.0, cov0=1.0, cov1=1.0):
    """Expected PC (MAP-EM) parameter flow (reference figure_4.py:167-231)."""

    def w_dot(w, mu):
        return (1 / (cov0 + cov1 * w**2) ** 2) * (
            cov1 * w * (x_var + x_mean**2)
            + x_mean * mu * (cov0 - cov1 * w**2)
            - cov0 * w * mu**2
        )

    def mu_dot(w, mu):
        return w * (x_mean - w * mu) / (cov0 + cov1 * w**2)

    w = np.arange(-10, 10.01, 0.01)
    W, MU = np.meshgrid(np.arange(-10, 11, 2), np.arange(-10, 11, 2))
    with np.errstate(invalid="ignore", divide="ignore"):
        disc = ((cov0 - cov1 * w**2) * x_mean) ** 2 + 4 * cov0 * cov1 * w**2 * (
            x_var + x_mean**2
        )
        root = np.sqrt(disc)
        n_w_1 = (-(cov0 - cov1 * w**2) * x_mean + root) / (-2 * cov0 * w)
        n_w_2 = (-(cov0 - cov1 * w**2) * x_mean - root) / (-2 * cov0 * w)
        n_mu = x_mean / w

    alpha = 0.5
    ax.quiver(W[W != 0], MU[W != 0], w_dot(W, MU)[W != 0] * 0.5,
              mu_dot(W, MU)[W != 0] * 0.5, color=[0.5, 0.5, 0.5],
              label=r"$\Delta \theta$")
    for sign in (w > 0, w < 0):
        ax.plot(w[sign], n_mu[sign], linewidth=1.6, color=[0, 0.5, 0, alpha])
        ax.plot(w[sign], n_w_2[sign], linewidth=1.6, color=[0.8, 0.6, 1.0, alpha])
    ax.plot(w, n_w_1, linewidth=1.6, color=[0.8, 0.6, 1.0, alpha])
    ax.scatter(
        np.sqrt(x_var - 1) * np.array([1, -1]),
        np.array([1, -1]) * x_mean / np.sqrt(x_var - 1),
        color="k", linewidth=2, facecolors="none", label="data",
    )
    return ax


# -- 1-D training runs ------------------------------------------------------------


def _one_d_model(start, key):
    model = mcpc.PCModel(
        [
            mcpc.Linear(1, 1),
            mcpc.PC(sample_x_fn=mcpc.sample_x_fn_normal),
            mcpc.Linear(1, 1, use_bias=False),
        ]
    )
    params = (
        {"w": jnp.zeros((1, 1)), "b": jnp.array([float(start[0])])},
        {"w": jnp.array([[float(start[1])]])},
    )
    return mcpc.GenerativeModel(model, key=key, params=params)


def _make_datas(ctx, n, batch_size, mu=1.0, var=5.0):
    key = ctx.key(4)
    return [
        mu + np.sqrt(var) * jax.random.normal(jax.random.fold_in(key, i), (batch_size, 1))
        for i in range(n)
    ]


def mcpc_linear_learning(ctx: ExperimentContext):
    """MCPC training trajectories over the analytic landscape
    (reference figure_4.py:88-165): one-step-per-batch Langevin learning with
    SGD+momentum on parameters."""
    mu, var = 1.0, 5.0
    batch_size, epochs, n = 256, 3, ctx.steps(125, minimum=10)
    datas = _make_datas(ctx, n, batch_size, mu, var)
    pseudo = jnp.zeros((batch_size, 1))

    config = {
        "input_var": 1.0,
        "mixing": 150,
        "sampling": 1,
        "optimizer_x_kwargs_mcpc": {"lr": 0.01},
        "optimizer_p_fn_mcpc": "sgd",
        "optimizer_p_kwargs_mcpc": {"lr": 0.07, "momentum": 0.2},
        "loss_fn": mcpc.fe_fn,
    }

    plt.figure()
    setup_fig(zero=True)
    fig, ax = plt.subplots(figsize=(4.5, 4.0))
    ax = mcpc_landscape(ax, mu, var)

    starts = [(1, 7), (7, -7), (-8, 5), (-8, -4)]
    for si, start in enumerate(starts):
        gen = _one_d_model(start, ctx.key(10 + si))
        trainer = get_mcpc_trainer(gen, config, training=True)
        weights = [start[1]]
        mus = [start[0]]
        for _ in range(epochs):
            for data in datas:
                trainer.train_on_batch(
                    pseudo,
                    loss_fn=config["loss_fn"],
                    loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
                    callback_after_t=mcpc.LangevinStep(var=2.0),
                    is_sample_x_at_batch_start=False,
                    is_return_results_every_t=False,
                )
                weights.append(float(gen.params[1]["w"][0, 0]))
                mus.append(float(gen.params[0]["b"][0]))
        ax.plot(weights, mus, "C0", linewidth=2.0,
                label="MCPC" if si == 0 else None)

    ax.set_xlabel(r"weight $W_0$")
    ax.set_ylabel(r"prior mean $\mu$")
    ax.set_xlim([-10, 10])
    ax.set_ylim([-10, 10])
    plt.legend(loc=1)
    plt.tight_layout()
    plt.savefig(ctx.fig_path("4b.svg"))
    plt.close("all")


def pc_linear_learning(ctx: ExperimentContext):
    """PC training trajectories (reference figure_4.py:233-308): converge to
    the PC landscape's fixed points, which differ from the data point."""
    mu, var = 1.0, 5.0
    batch_size, epochs, n = 256, 3, ctx.steps(300, minimum=10)
    datas = _make_datas(ctx, n, batch_size, mu, var)
    pseudo = jnp.zeros((batch_size, 1))

    config = {
        "input_var": 1.0,
        "T_pc": ctx.steps(150, minimum=20),
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.1},
        "optimizer_p_fn": "sgd",
        "optimizer_p_kwargs": {"lr": 0.4, "momentum": 0.1},
        "loss_fn": mcpc.fe_fn,
    }

    plt.figure()
    setup_fig(zero=True)
    fig, ax = plt.subplots(figsize=(4.5, 4.0))
    ax = pc_landscape(ax, mu, var)

    starts = [(-8, -4), (1, 7), (-8, 5), (7, -7)]
    for si, start in enumerate(starts):
        gen = _one_d_model(start, ctx.key(20 + si))
        trainer = get_pc_trainer(gen, config, is_mcpc=False, training=True)
        weights = [start[1]]
        mus = [start[0]]
        for _ in range(epochs):
            for data in datas:
                trainer.train_on_batch(
                    pseudo,
                    loss_fn=mcpc.fe_fn,
                    loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
                    is_return_results_every_t=False,
                )
                weights.append(float(gen.params[1]["w"][0, 0]))
                mus.append(float(gen.params[0]["b"][0]))
        ax.plot(weights, mus, "r", linewidth=2.0, label="PC" if si == 0 else None)

    ax.set_xlabel(r"weight $W_0$")
    ax.set_ylabel(r"prior mean $\mu$")
    ax.set_xlim([-10, 10])
    ax.set_ylim([-10, 10])
    plt.legend(loc=1)
    plt.tight_layout()
    plt.savefig(ctx.fig_path("4c.svg"))
    plt.close("all")


def comparison_linear_model(ctx: ExperimentContext):
    """Train PC and MCPC 1-D models from the same start and compare the
    learned densities against the data density (reference
    figure_4.py:310-412)."""
    mu, var = 1.0, 5.0
    batch_size, epochs, n = 256, 3, ctx.steps(125, minimum=10)
    start = (-7, -5)
    datas = _make_datas(ctx, n, batch_size, mu, var)
    pseudo = jnp.zeros((batch_size, 1))

    config_pc = {
        "input_size": 1,
        "input_var": 1.0,
        "T_pc": ctx.steps(150, minimum=20),
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.5},
        "optimizer_p_fn": "adam",
        "optimizer_p_kwargs": {"lr": 0.15},
        "loss_fn": mcpc.fe_fn,
    }
    config_mcpc = {
        "input_size": 1,
        "input_var": 1.0,
        "T_pc": 1,
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.5},
        "mixing": 199,
        "sampling": 1,
        "optimizer_x_kwargs_mcpc": {"lr": 0.005},
        "optimizer_p_fn_mcpc": "adam",
        "optimizer_p_kwargs_mcpc": {"lr": 0.07},
        "loss_fn": mcpc.fe_fn,
    }

    gen_pc = _one_d_model(start, ctx.key(30))
    gen_mc = _one_d_model(start, ctx.key(31))
    pc_trainer = get_pc_trainer(gen_pc, config_pc, is_mcpc=False, training=True)
    pc_warm_mc = get_pc_trainer(gen_mc, config_mcpc, is_mcpc=True, training=True)
    mc_trainer = get_mcpc_trainer(gen_mc, config_mcpc, training=True)

    for _ in range(epochs):
        for data in datas:
            kwargs = {"_target": data, "_var": 1.0}
            pc_trainer.train_on_batch(pseudo, loss_fn=mcpc.fe_fn, loss_fn_kwargs=kwargs,
                                      is_return_results_every_t=False)
            pc_warm_mc.train_on_batch(pseudo, loss_fn=mcpc.fe_fn, loss_fn_kwargs=kwargs,
                                      is_return_results_every_t=False)
            mc_trainer.train_on_batch(
                pseudo, loss_fn=mcpc.fe_fn, loss_fn_kwargs=kwargs,
                callback_after_t=mcpc.LangevinStep(var=2.0),
                is_sample_x_at_batch_start=False, is_return_results_every_t=False,
            )

    num_samples = 15000
    pc_samples = np.asarray(sample_pc(num_samples, gen_pc, config_pc, key=ctx.key(32)))
    mc_samples = np.asarray(sample_pc(num_samples, gen_mc, config_mcpc, key=ctx.key(33)))

    y = np.linspace(-10, 10, 500)
    gen_pdf = np.exp(-0.5 * (y - mu) ** 2 / var) / np.sqrt(2 * np.pi * var)

    plt.figure()
    setup_fig(zero=True)
    plt.plot(y, gen_pdf, "k", label=r"$p(y)$", linewidth=3)
    plt.hist(mc_samples.ravel(), bins=20, density=True, label="MCPC")
    plt.hist(pc_samples.ravel(), bins=20, density=True, label="PC", color="r", alpha=0.6)
    plt.xlabel("$x_0$, y")
    plt.ylabel("probability density " + r"$p(x_0;\theta)$")
    plt.xlim([-12, 12])
    plt.legend(loc=0)
    plt.tight_layout()
    plt.savefig(ctx.fig_path("4a.svg"))
    plt.close()
    return {
        "mcpc_var": float(mc_samples.var()),
        "pc_var": float(pc_samples.var()),
        "data_var": var,
    }


def image_reconstruction(ctx: ExperimentContext):
    """Masked-digit reconstruction grid: input / PC / MCPC / DLGM
    (reference figure_4.py:414-534)."""
    from ..eval.metrics import decode_from_deepest_latent
    from ..models.dlgm import DLGM, generative_forward, recognition_forward
    from ..utils.checkpoint import load_checkpoint
    import os

    config_mcpc = {
        "input_size": 10, "hidden_size": 256, "hidden2_size": 256,
        "output_size": 784, "loss_fn": mcpc.bernoulli_fn, "activation_fn": "relu",
        "input_var": None,
        "T_pc": ctx.steps(250), "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.7},
        "mixing": ctx.steps(50), "sampling": ctx.steps(100),
        "optimizer_x_kwargs_mcpc": {"lr": 0.03},
    }
    config_pc = {
        "batch_size_train": 1024, "batch_size_val": 1024, "batch_size_test": 1024,
        "input_size": 30, "hidden_size": 256, "hidden2_size": 256,
        "output_size": 784, "loss_fn": mcpc.bernoulli_fn, "activation_fn": "tanh",
        "input_var": None,
        "T_pc": ctx.steps(250), "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.7},
    }

    gen_mcpc = load_generative_checkpoint(ctx, "mcpc_mse_1", config_mcpc)
    gen_pc = load_generative_checkpoint(ctx, "pc_mse_1", config_pc)
    dlgm = DLGM(784, 256, 20, factor_recog=1, key=ctx.key(40))
    dlgm_ckpt = os.path.join(ctx.path_models, "dlgm_mse_1.msgpack")
    if os.path.isfile(dlgm_ckpt):
        dlgm.gen_params, dlgm.rec_params = load_checkpoint(
            dlgm_ckpt, (dlgm.gen_params, dlgm.rec_params)
        )

    _, _, test_loader = get_mnist_data(config_pc)
    data, label = next(iter(test_loader))
    k = round(data.shape[1] / 2)

    tr_mc = get_pc_trainer(gen_mcpc, config_mcpc, training=False, is_mcpc=True)
    tr_pc = get_pc_trainer(gen_pc, config_pc, training=False, is_mcpc=True)
    tr_mc.train_on_batch(
        jnp.zeros((data.shape[0], config_mcpc["input_size"])),
        loss_fn=mcpc.bernoulli_fn_mask, loss_fn_kwargs={"_target": data},
        is_return_results_every_t=False,
    )
    tr_pc.train_on_batch(
        jnp.zeros((data.shape[0], config_pc["input_size"])),
        loss_fn=mcpc.bernoulli_fn_mask, loss_fn_kwargs={"_target": data},
        is_return_results_every_t=False,
    )

    img_mc = jax.nn.sigmoid(decode_from_deepest_latent(gen_mcpc))
    img_pc = jax.nn.sigmoid(decode_from_deepest_latent(gen_pc))
    masked = data.at[:, :-k].set(0.0)
    mus, _ = recognition_forward(dlgm.rec_params, dlgm.factors, masked)
    img_dlgm = generative_forward(dlgm.gen_params, mus)

    img_mc = np.asarray(img_mc.at[:, -k:].set(data[:, -k:]))
    img_pc = np.asarray(img_pc.at[:, -k:].set(data[:, -k:]))
    img_dlgm = np.asarray(img_dlgm.at[:, -k:].set(data[:, -k:]))
    data_np = np.asarray(data)
    label_np = np.asarray(label)

    f, axs = plt.subplots(4, 10, sharey=True, sharex=True)
    for i in range(10):
        rows = np.where(label_np == i)[0]
        idx = rows[min(5, len(rows) - 1)] if len(rows) else 0
        d = data_np[idx].reshape(28, 28).copy()
        d[: 28 - round(28 / 2), :] = 0.0
        for r, img in enumerate([d, img_pc[idx].reshape(28, 28),
                                 img_mc[idx].reshape(28, 28),
                                 img_dlgm[idx].reshape(28, 28)]):
            axs[r][i].imshow(img, cmap="gray")
            axs[r][i].set_xticks([])
            axs[r][i].set_yticks([])
    for r, name in enumerate(["input", "PC", "MCPC", "DLGM"]):
        axs[r][0].set_ylabel(name)
    plt.savefig(ctx.fig_path("4e.svg"))
    plt.close()


def image_generation(ctx: ExperimentContext):
    """Sample grids: PC ancestral samples vs DLGM prior samples
    (reference figure_4.py:536-592)."""
    from ..models.dlgm import DLGM
    from ..utils.checkpoint import load_checkpoint
    import os

    config_pc = {
        "input_size": 20, "hidden_size": 128, "hidden2_size": 128,
        "output_size": 784, "loss_fn": mcpc.bernoulli_fn, "activation_fn": "relu",
        "T_pc": 250, "optimizer_x_fn_pc": "adam", "optimizer_x_kwargs_pc": {"lr": 0.1},
    }
    gen_pc = load_generative_checkpoint(ctx, "pc_fid_1", config_pc)
    dlgm = DLGM(784, 256, 20, factor_recog=1, key=ctx.key(41))
    ckpt = os.path.join(ctx.path_models, "dlgm_fid_1.msgpack")
    if os.path.isfile(ckpt):
        dlgm.gen_params, dlgm.rec_params = load_checkpoint(
            ckpt, (dlgm.gen_params, dlgm.rec_params)
        )

    num = 256
    pc_samples = jax.nn.sigmoid(
        sample_pc(num, gen_pc, config_pc, key=ctx.key(42), is_return_hidden=True)
    )
    pc_samples = np.asarray(pc_samples).reshape(-1, 28, 28)
    dlgm_samples = np.asarray(
        dlgm.generate_samples(num, is_return_hidden=True, key=ctx.key(43))
    )

    n = 8
    f, axs = plt.subplots(2, n, sharey=True, sharex=True)
    for i in range(n):
        axs[0][i].imshow(pc_samples[(num // n) * i], cmap="gray")
        axs[1][i].imshow(dlgm_samples[(num // n) * i], cmap="gray")
        for r in range(2):
            axs[r][i].set_xticks([])
            axs[r][i].set_yticks([])
    axs[0][0].set_ylabel("PC")
    axs[1][0].set_ylabel("DLGM")
    plt.savefig(ctx.fig_path("4d.svg"))
    plt.close()


if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    ctx = context_from_args(args)
    comparison_linear_model(ctx)
    mcpc_linear_learning(ctx)
    pc_linear_learning(ctx)
    image_reconstruction(ctx)
    image_generation(ctx)
