"""Figure 6 — robustness to Langevin-noise variance
(reference ``/root/reference/figure_6.py``).

Sweep the injected noise variance over log-spaced values: train the 1-D model
with one-sample MCPC, then sample the trained generative model with a
trailing output PC site; plot generated variance and learned |W| against the
noise level.  The ideal curve is |W| = sqrt(2*var/sigma^2 - 1)
(reference figure_6.py:141), and learning degrades away from the correct
noise variance 2 (figure_6.py:71,93).

TPU-native twist: the sweep over noise levels is embarrassingly parallel —
each level is an independent chain — so the per-level training runs
sequentially but each step is one compiled scan.
"""

from __future__ import annotations

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from ..models.factory import get_mcpc_trainer_one_sample
from ..utils.plotting import setup_fig
from .common import ExperimentContext, context_from_args, standard_parser


def varying_langevin_noise(ctx: ExperimentContext, noise_vars: np.ndarray):
    """Reference figure_6.py:23-156."""
    mu, var = 1.0, 5.0
    batch_size = 2048
    n = ctx.steps(25, minimum=4)
    epochs = ctx.steps(10, minimum=2)
    start = (-7.0, -5.0)

    key = ctx.key(6)
    import jax

    datas = [
        mu + np.sqrt(var) * jax.random.normal(jax.random.fold_in(key, i), (batch_size, 1))
        for i in range(n)
    ]
    pseudo = jnp.zeros((batch_size, 1))

    results_var, results_weights = [], []
    for idx, noise_var in enumerate(noise_vars):
        model = mcpc.PCModel(
            [
                mcpc.Linear(1, 1),
                mcpc.PC(sample_x_fn=mcpc.sample_x_fn_normal),
                mcpc.Linear(1, 1, use_bias=False),
            ]
        )
        params = (
            {"w": jnp.zeros((1, 1)), "b": jnp.array([start[0]])},
            {"w": jnp.array([[start[1]]])},
        )
        gen = mcpc.GenerativeModel(model, key=ctx.key(100 + idx), params=params)

        # lr coupled to the noise level (reference figure_6.py:58-60)
        config = {
            "input_var": 1.0,
            "K": ctx.steps(150, minimum=20),
            "optimizer_x_kwargs_mcpc": {
                "lr": float(np.clip(0.01 * noise_var / 2, 0.001, 0.05))
            },
            "optimizer_p_fn_mcpc": "adam",
            "optimizer_p_kwargs_mcpc": {"lr": float(np.clip(0.3 / noise_var, 0.5, 3))},
            "loss_fn": mcpc.fe_fn,
        }
        trainer = get_mcpc_trainer_one_sample(gen, config, training=True)
        for _ in range(epochs):
            for data in datas:
                trainer.train_on_batch(
                    pseudo,
                    loss_fn=config["loss_fn"],
                    loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
                    callback_after_t=mcpc.LangevinStep(var=float(noise_var)),
                    is_sample_x_at_batch_start=True,
                    is_return_results_every_t=False,
                )

        # generation: append an output PC site (reference figure_6.py:80-86)
        gen_model = mcpc.PCModel(
            list(model.modules)
            + [
                mcpc.PC(
                    energy_fn=mcpc.scaled_gaussian_energy(config["input_var"]),
                    sample_x_fn=mcpc.sample_x_fn_normal,
                )
            ]
        )
        gen_sample = mcpc.GenerativeModel(
            gen_model, key=ctx.key(200 + idx), params=gen.params
        )
        config_gen = dict(config)
        config_gen["K"] = ctx.steps(10000, minimum=500)
        config_gen["optimizer_x_kwargs_mcpc"] = {
            "lr": max(0.01, config["optimizer_x_kwargs_mcpc"]["lr"])
        }
        sampler = get_mcpc_trainer_one_sample(gen_sample, config_gen, training=False)
        res = sampler.train_on_batch(
            pseudo,
            loss_fn=None,
            callback_after_t=mcpc.LangevinStep(var=float(noise_var)),
            is_sample_x_at_batch_start=True,
            is_return_results_every_t=False,
            is_return_outputs=True,
        )
        generated = np.asarray(res["outputs"][-1]).squeeze()
        results_var.append(float(np.var(generated)))
        results_weights.append(
            [float(gen.params[0]["b"][0]), float(gen.params[1]["w"][0, 0])]
        )

        if len(noise_vars) <= 4:
            y = np.linspace(-10, 10, 500)
            data_pdf = np.exp(-0.5 * (y - mu) ** 2 / var) / np.sqrt(2 * np.pi * var)
            plt.figure()
            setup_fig(zero=True)
            plt.plot(y, data_pdf, "k", label=r"$p(y)$", linewidth=3)
            plt.hist(generated, bins=np.linspace(-12, 12, 21), density=True, label="MCPC")
            plt.xlabel("$x_0$, y")
            plt.ylabel("probability " + r"$p(x_0;\theta)$")
            plt.xlim([-12, 12])
            plt.title(r"$\sigma^2$ : " + str(noise_var / 2))
            plt.legend()
            plt.tight_layout()
            plt.savefig(ctx.fig_path(f"6a_{idx}.svg"))
            plt.close()

    results_var = np.array(results_var)
    weights = np.array(results_weights)
    if len(noise_vars) > 4:
        plt.figure()
        setup_fig(zero=True)
        plt.plot(noise_vars, results_var, linewidth=3, label="MCPC")
        plt.hlines(var, noise_vars.min(), noise_vars.max(), colors="black", label="data")
        plt.vlines(2 * var, results_var.min(), results_var.max(), colors="grey",
                   linestyles="dashed", label="learning limit")
        plt.xlabel(r"Langevin noise variance $2\sigma^2$")
        plt.ylabel(r"variance of x$_0$, y")
        plt.xscale("log")
        plt.legend(loc=0)
        plt.tight_layout()
        plt.savefig(ctx.fig_path("6b.svg"))
        plt.close()

        plt.figure()
        setup_fig(zero=True)
        mask = noise_vars <= 10
        ideal = np.sqrt(2 * var / noise_vars[mask] - 1)
        plt.plot(noise_vars[mask], ideal, "--k", label="ideal", linewidth=4)
        plt.plot(noise_vars, np.abs(weights[:, 1]), "C0", linewidth=3, label="MCPC")
        plt.vlines(2 * var, np.abs(weights[:, 1]).min(), np.abs(weights[:, 1]).max(),
                   colors="grey", linestyles="dashed", label="learning limit")
        plt.xlabel(r"Langevin noise variance $2\sigma^2$")
        plt.ylabel(r"learned |$W_0$|")
        plt.xscale("log")
        plt.ylim(0, 10)
        plt.legend(loc=0)
        plt.tight_layout()
        plt.savefig(ctx.fig_path("6c.svg"))
        plt.close()
    return noise_vars, results_var, weights


if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    ctx = context_from_args(args)
    n_points = 40 if args.full else 8
    # sweep (6b/6c), then the 4-point run that produces the 6a density
    # panels (reference figure_6.py:166-167)
    varying_langevin_noise(ctx, np.logspace(-1, 1.5, n_points))
    varying_langevin_noise(ctx, np.array([0.2, 2.0, 8.0, 20.0]))
