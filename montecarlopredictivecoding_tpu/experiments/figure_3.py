"""Figure 3 — generation via unclamped Langevin sampling
(reference ``/root/reference/figure_3.py``).

(a) 1-D linear model with a trailing PC site at the output (the sensory unit
    itself is an unclamped latent): the chain's x0 samples match the
    closed-form marginal p(x0) = N(w*mu, w^2 + var);
(b) MNIST: a long unclamped chain on a trained model wanders across digit
    classes; frames saved as a grid + GIF.
"""

from __future__ import annotations

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from ..models.factory import get_mcpc_trainer, get_pc_trainer
from ..utils.plotting import animate_frames, generate_video, setup_fig
from .common import ExperimentContext, context_from_args, load_generative_checkpoint, standard_parser


def generation_linear_model(ctx: ExperimentContext):
    """Reference figure_3.py:23-117: output PC site with energy
    (1/var)*0.5*(mu-x)^2 (figure_3.py:47-55); unclamped MCPC chain (no
    loss_fn) samples the joint; marginal p(x0)=N(w*mu, w^2+var)."""
    mu0, w, input_var = 0.5, 2.0, 1.0
    model = mcpc.PCModel(
        [
            mcpc.Linear(1, 1),
            mcpc.PC(sample_x_fn=mcpc.sample_x_fn),
            mcpc.Linear(1, 1, use_bias=False),
            mcpc.PC(
                energy_fn=mcpc.scaled_gaussian_energy(input_var),
                sample_x_fn=mcpc.sample_x_fn,
            ),
        ]
    )
    params = ({"w": jnp.zeros((1, 1)), "b": jnp.array([mu0])}, {"w": jnp.array([[w]])})
    gen = mcpc.GenerativeModel(model, key=ctx.key(1), params=params)

    config = {
        "T_pc": ctx.steps(250),
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.5},
        "mixing": 0,
        "sampling": ctx.steps(10000),
        "optimizer_x_kwargs_mcpc": {"lr": 0.3},
        "input_var": input_var,
    }
    pc_trainer = get_pc_trainer(gen, config, is_mcpc=True, training=False)
    mcpc_trainer = get_mcpc_trainer(gen, config, training=False)

    pseudo = jnp.zeros((1, 1))
    pc_trainer.train_on_batch(pseudo, loss_fn=None)
    mc_results = mcpc_trainer.train_on_batch(
        pseudo,
        loss_fn=None,
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False,
        is_return_xs=True,
    )
    # sensory samples are the second PC latent (x0)
    x0 = np.asarray(mc_results["xs"][1])[config["mixing"]:, 0, 0]

    y = np.linspace(-10, 10, 500)
    gen_pdf = (
        1.0 / np.sqrt(2 * np.pi * (w**2 + input_var))
    ) * np.exp(-0.5 * (y - mu0 * w) ** 2 / (w**2 + input_var))

    plt.figure()
    setup_fig(zero=True)
    plt.plot(y, gen_pdf, "k", label=r"$p(x_0;\theta)$", linewidth=3)
    plt.hist(x0, bins=20, density=True, label="MCPC")
    plt.xlabel("$x_0$")
    plt.ylabel("probability density")
    plt.xlim([-6, 9])
    plt.ylim([0, 0.22])
    plt.legend(loc=1)
    plt.tight_layout()
    plt.savefig(ctx.fig_path("3a.svg"))
    plt.close()

    anim = x0[:: max(len(x0) // 100, 1)][:100]

    def frame(i, ax):
        ax.hist(anim[: i + 1], density=True, bins=np.linspace(-12, 12, 20),
                label="hist($x_0(t)$), [0, t]")
        ax.plot(y, gen_pdf, "k", label=r"$p(x_0;\theta)$", linewidth=3)
        ax.scatter(anim[i], 0, c="orange", s=70, label=r"x$_0$(t)")
        ax.set_xlabel("$x_0$")
        ax.set_ylabel("probability density")
        ax.set_xlim([-10, 10])
        ax.set_ylim([-0.025, 0.3])
        ax.legend(loc=0)

    animate_frames(frame, len(anim), ctx.fig_path("3a.gif"), fps=25)
    return {"mean": float(x0.mean()), "var": float(x0.var())}


def generation_non_linear_model(ctx: ExperimentContext):
    """Reference figure_3.py:120-179: 30k-step unclamped chain on a trained
    MNIST model (checkpoint mcpc_fid_3), zero_fn sensory loss."""
    config = {
        "input_size": 20,
        "hidden_size": 128,
        "hidden2_size": 128,
        "output_size": 784,
        "activation_fn": "relu",
        "loss_fn": mcpc.zero_fn,
        "T_pc": ctx.steps(250),
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.7},
        "mixing": ctx.steps(1000),
        "sampling": ctx.steps(30000),
        "optimizer_x_kwargs_mcpc": {"lr": 0.1},
    }
    gen = load_generative_checkpoint(ctx, "mcpc_fid_3", config)
    pc_trainer = get_pc_trainer(gen, config, training=False, is_mcpc=True)
    mcpc_trainer = get_mcpc_trainer(gen, config, training=False)

    pseudo = jnp.zeros((1, config["input_size"]))
    pc_trainer.train_on_batch(pseudo, loss_fn=None)
    stride = max((config["mixing"] + config["sampling"]) // 600, 1)
    mc_results = mcpc_trainer.train_on_batch(
        pseudo,
        loss_fn=config["loss_fn"],
        loss_fn_kwargs={},
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False,
        is_return_outputs=True,
        capture_stride=stride,
    )
    outputs = np.asarray(mc_results["outputs"])  # [T/stride, 1, 784]
    from scipy.special import expit

    ims = expit(outputs[:, 0, :]).reshape(-1, 28, 28)

    nrow, ncol = 2, 5
    f, axs = plt.subplots(nrow, ncol, sharey=True)
    start = config["mixing"] // stride
    indent = max((len(ims) - start) // (nrow * ncol), 1)
    for i in range(nrow * ncol):
        idx = min(start + i * indent, len(ims) - 1)
        axs[i // ncol, i % ncol].imshow(ims[idx], cmap="gray")
        axs[i // ncol][i % ncol].axis("off")
    plt.suptitle("Generated with sampler")
    plt.savefig(ctx.fig_path("3b_and_4d.svg"))
    plt.close()

    generate_video(
        ims[:: max(len(ims) // 150, 1)],
        save=True,
        title="input neuron activity",
        file_name="3b_and_4d",
        out_dir=ctx.path_figures,
    )
    return ims


if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    ctx = context_from_args(args)
    generation_linear_model(ctx)
    generation_non_linear_model(ctx)
