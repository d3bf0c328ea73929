"""Figure 2 — posterior inference (reference ``/root/reference/figure_2.py``).

(a/b) 1-D linear-Gaussian model: MCPC Langevin samples vs the closed-form
      posterior vs the PC MAP, plus inference trajectories and a sampling GIF;
(c/d) nonlinear MNIST model: latent classifier probe, full-/masked-digit
      class posteriors on the probability simplex;
(e)   KL(ideal-observer CNN ‖ MCPC / PC / shuffled) class posteriors.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from ..data import get_mnist_data
from ..eval.classifier import get_representations, train_linear_classifier
from ..eval.metrics import kl_divergence_discrete
from ..models.factory import get_mcpc_trainer, get_pc_trainer
from ..utils.plotting import animate_frames, proba_to_coordinate, setup_fig
from .common import ExperimentContext, context_from_args, load_generative_checkpoint, standard_parser


def posterior_linear_model(ctx: ExperimentContext):
    """1-D model x1 ~ N(0.2, 1), y ~ N(2*x1, 1): MCPC samples match the
    analytic posterior; PC lands on the MAP (reference figure_2.py:29-140,
    analytic posterior at :79)."""
    mu0, w, input_var, y_obs = 0.2, 2.0, 1.0, 1.0
    model = mcpc.PCModel(
        [
            mcpc.Linear(1, 1),
            mcpc.PC(sample_x_fn=mcpc.sample_x_fn_cte),
            mcpc.Linear(1, 1, use_bias=False),
        ]
    )
    params = ({"w": jnp.zeros((1, 1)), "b": jnp.array([mu0])}, {"w": jnp.array([[w]])})
    gen = mcpc.GenerativeModel(model, key=ctx.key(0), params=params)

    config = {
        "input_var": input_var,
        "T_pc": ctx.steps(2000),
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.02},
        "mixing": 0,
        "sampling": ctx.steps(10000),
        "optimizer_x_kwargs_mcpc": {"lr": 0.02},
        "optimizer_p_fn_mcpc": "adam",
        "loss_fn": mcpc.fe_fn,
    }
    pc_trainer = get_pc_trainer(gen, config, is_mcpc=True, training=False)
    mcpc_trainer = get_mcpc_trainer(gen, config, training=False)

    batch = 1
    data = jnp.full((batch, 1), y_obs)
    pseudo = jnp.zeros((batch, 1))
    pc_results = pc_trainer.train_on_batch(
        pseudo,
        loss_fn=config["loss_fn"],
        loss_fn_kwargs={"_target": data, "_var": input_var},
        is_return_representations=True,
    )
    map_est = float(gen.latents[0][0, 0])
    mc_results = mcpc_trainer.train_on_batch(
        pseudo,
        loss_fn=config["loss_fn"],
        loss_fn_kwargs={"_target": data, "_var": input_var},
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=True,
        is_return_representations=True,
    )

    # closed-form posterior (reference figure_2.py:79)
    x_post = np.linspace(-10, 10, 1000)
    post = (
        np.sqrt(w**2 + input_var)
        / np.sqrt(2 * np.pi * input_var)
        * np.exp(
            -0.5
            * (
                (x_post - mu0) ** 2
                + (y_obs - w * x_post) ** 2 / input_var
                - (y_obs - w * mu0) ** 2 / (w**2 + input_var)
            )
        )
    )

    samples = np.asarray(mc_results["representations"])[config["mixing"]:, 0, 0]

    plt.figure()
    setup_fig(zero=False)
    plt.plot(x_post, post, "k", label=r"$p(x_1|y;\theta)$", linewidth=3)
    plt.hist(samples, bins=20, density=True, label="MCPC")
    plt.vlines(map_est, 0, 1, colors="r", label="PC", linewidth=3)
    plt.xlabel(r"$x_1$")
    plt.ylabel("probability density")
    plt.xlim([-2, 4.5])
    plt.ylim([0, 1.0])
    plt.legend(loc=1)
    plt.tight_layout()
    plt.savefig(ctx.fig_path("2b.svg"))
    plt.close()

    plt.figure()
    setup_fig()
    mc_traj = np.asarray(mc_results["representations"])[:, 0, 0]
    pc_traj = np.asarray(pc_results["representations"])[:, 0, 0]
    plt.plot(mc_traj, "C0", label="MCPC", linewidth=2.5)
    plt.plot(pc_traj, "red", label="PC", linewidth=3)
    plt.xlim([-5, min(1000, len(mc_traj))])
    plt.ylim([-1.1, 3.1])
    plt.xlabel("time (AU)")
    plt.ylabel(r"$x_1$")
    plt.legend()
    plt.tight_layout()
    plt.savefig(ctx.fig_path("2a.svg"))
    plt.close()

    # sampling animation (reference figure_2.py:113-138)
    anim = samples[:: max(len(samples) // 100, 1)][:100]

    def frame(i, ax):
        ax.hist(anim[: i + 1], density=True, bins=np.linspace(-1.5, 2.5, 20),
                label=r"hist($x_1(t)$), [0, t]")
        ax.plot(x_post, post, "k", label=r"$p(x_1|y;\theta)$", linewidth=3)
        ax.scatter(anim[i], 0, c="orange", s=70, label=r"$x_1$(t)")
        ax.set_xlabel(r"$x_1$")
        ax.set_ylabel("probability")
        ax.set_xlim([-1.5, 3.5])
        ax.set_ylim([-0.1, 1.4])
        ax.legend(loc=1)

    animate_frames(frame, len(anim), ctx.fig_path("2b.gif"), fps=25)
    return {"map": map_est, "samples_mean": float(samples.mean()), "samples_var": float(samples.var())}


def _mnist_config(ctx: ExperimentContext) -> dict:
    """Reference nonlinear-inference config (figure_2.py:154-174)."""
    return {
        "batch_size_train": 1024,
        "batch_size_val": 1024,
        "batch_size_test": 1024,
        "input_size": 20,
        "hidden_size": 128,
        "hidden2_size": 128,
        "output_size": 784,
        "loss_fn": mcpc.bernoulli_fn,
        "activation_fn": "relu",
        "input_var": None,
        "T_pc": ctx.steps(2000),
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.1},
        "mixing": ctx.steps(1000),
        "sampling": ctx.steps(9000),
        "optimizer_x_kwargs_mcpc": {"lr": 0.03},
    }


def _train_probe(ctx, gen, config, n_batches: int = 2):
    """MAP representations on (a slice of) the training set, then the linear
    classifier probe (reference figure_2.py:197-216)."""
    train_loader, _, _ = get_mnist_data(config)
    batches = []
    for i, b in enumerate(train_loader):
        if i >= n_batches:
            break
        batches.append(b)
    pc_trainer = get_pc_trainer(gen, config, training=False, is_mcpc=True)
    reps, labels = get_representations(gen, config, [pc_trainer], batches, rep_type="MAP")
    clf, acc = train_linear_classifier(reps, labels, epochs=10)
    print(f"linear probe train accuracy: {acc:.3f}")
    return clf


def posterior_non_linear_model(ctx: ExperimentContext, img_kept: float = 0.5):
    """Masked-digit class posteriors on the probability simplex
    (reference figure_2.py:142-296)."""
    config = _mnist_config(ctx)
    gen = load_generative_checkpoint(ctx, "mcpc_ml_2", config)
    clf = _train_probe(ctx, gen, config)

    _, _, test_loader = get_mnist_data(config)
    data, label = next(iter(test_loader))
    digit = 4
    sel = np.asarray(label) == digit
    data = data[np.where(sel)[0][:16]]

    pc_trainer = get_pc_trainer(gen, config, training=False, is_mcpc=True)
    mcpc_trainer = get_mcpc_trainer(gen, config, training=False)
    pseudo = jnp.zeros((data.shape[0], config["input_size"]))
    kwargs = {"_target": data, "_var": config["input_var"], "perc": img_kept}
    pc_results = pc_trainer.train_on_batch(
        pseudo, loss_fn=mcpc.bernoulli_fn_mask, loss_fn_kwargs=kwargs,
        is_return_representations=True,
    )
    mc_results = mcpc_trainer.train_on_batch(
        pseudo, loss_fn=mcpc.bernoulli_fn_mask, loss_fn_kwargs=kwargs,
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False, is_return_representations=True,
    )

    def probs(reps):  # [T, B, d] -> [T, B, 10] softmax of the probe
        logits = np.asarray(reps) @ np.asarray(clf.params["w"]) + np.asarray(clf.params["b"])
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    preds_pc = probs(pc_results["representations"])
    preds_mc = probs(mc_results["representations"])[config["mixing"]:]

    file_type = "full" if img_kept == 1.0 else "masked"
    os.makedirs(ctx.fig_path("digit_posteriors"), exist_ok=True)
    for idx in range(min(10, data.shape[0])):
        coor_pc, _ = proba_to_coordinate(preds_pc[-1, idx])
        coor_prev, class_coor = proba_to_coordinate(preds_mc[:, idx])
        fig, axs = plt.subplots(1, 1, constrained_layout=True)
        axs.set_aspect("equal")
        plt.axis("off")
        axs.hexbin(coor_prev[0], coor_prev[1], gridsize=20, cmap="Blues",
                   extent=(-1, 1, -1, 1), label="MCPC")
        for d in range(10):
            axs.text(1.15 * class_coor[0][d] - 0.038, 1.15 * class_coor[1][d] - 0.04,
                     str(d), fontsize=20)
        axs.scatter(coor_pc[0], coor_pc[1], c="red", linewidths=6, marker="o",
                    facecolor="none", label="PC")
        axs.set_xlim([-1.2, 1.2])
        axs.set_ylim([-1.2, 1.2])
        plt.legend(fontsize=14, loc=3)
        plt.savefig(os.path.join(ctx.fig_path("digit_posteriors"), f"{file_type}_{idx}.svg"))
        if idx == 4:
            plt.savefig(ctx.fig_path("2c.svg" if img_kept == 1.0 else "2d.svg"))
        plt.close()
    return preds_pc, preds_mc


def comparison_ideal_observer(ctx: ExperimentContext, resnet_state=None):
    """KL(ideal observer ‖ MCPC/PC/shuffled) (reference figure_2.py:299-430).

    The reference loads ``models/resnet9`` (absent upstream); here the
    observer is trained in-framework when no state is passed."""
    from ..models.resnet9 import ResNet9, make_eval_fn, train_resnet9

    config = _mnist_config(ctx)
    config["batch_size_test"] = 128
    gen = load_generative_checkpoint(ctx, "mcpc_ml_2", config)
    clf = _train_probe(ctx, gen, config)

    _, _, test_loader = get_mnist_data(config)
    if resnet_state is None:
        train_loader, _, _ = get_mnist_data(config)
        model, resnet_state = train_resnet9(train_loader, epochs=1)
    else:
        model = ResNet9()
    logits_fn = make_eval_fn(model)

    pc_trainer = get_pc_trainer(gen, config, is_mcpc=True, training=False)
    mcpc_trainer = get_mcpc_trainer(gen, config, training=False)

    kls = np.zeros(4)
    rng = np.random.RandomState(ctx.seed)
    for bi, (data, label) in enumerate(test_loader):
        if bi >= 1:  # reference iterates the full test loader; one batch here
            break
        pseudo = jnp.zeros((data.shape[0], config["input_size"]))
        kwargs = {"_target": data, "_var": config["input_var"]}
        pc_trainer.train_on_batch(pseudo, loss_fn=mcpc.bernoulli_fn_mask, loss_fn_kwargs=kwargs)
        rep_pc = np.asarray(gen.latents[0])
        p_pc = _softmax(rep_pc @ np.asarray(clf.params["w"]) + np.asarray(clf.params["b"]))
        p_pc = _norm(p_pc + 1e-4)

        res = mcpc_trainer.train_on_batch(
            pseudo, loss_fn=mcpc.bernoulli_fn_mask, loss_fn_kwargs=kwargs,
            callback_after_t=mcpc.LangevinStep(var=2.0),
            is_sample_x_at_batch_start=False, is_return_representations=True,
        )
        reps = np.asarray(res["representations"])[config["mixing"]:]
        p_mc = _softmax(reps @ np.asarray(clf.params["w"]) + np.asarray(clf.params["b"])).mean(0)
        p_mc = _norm(p_mc + 1e-4)

        imgs = np.asarray(data).reshape(-1, 28, 28, 1).copy()
        imgs[:, :14, :, :] = 0.0  # ideal observer sees the masked image
        p_cnn = _softmax(np.asarray(logits_fn(resnet_state, jnp.asarray(imgs))))

        kls[0] += kl_divergence_discrete(p_cnn, p_mc)
        kls[1] += kl_divergence_discrete(p_cnn, p_pc)
        kls[2] += kl_divergence_discrete(p_cnn, p_mc[rng.permutation(len(p_mc))])
        kls[3] += kl_divergence_discrete(p_cnn, p_pc[rng.permutation(len(p_pc))])

    import pandas as pd

    results = pd.DataFrame(
        data={"KL": kls}, index=["MCPC", "PC", "MC shuffled", "PC shuffled"]
    )
    print(results)

    plt.figure()
    setup_fig()
    xlabel = ["MCPC", "PC", "random"]
    vals = [kls[0], kls[1], kls[2:].mean()]
    bars = plt.bar(xlabel, vals, width=0.6)
    for b, c in zip(bars, ["C0", "r", "grey"]):
        b.set_color(c)
    plt.ylabel("KL divergence")
    plt.tight_layout()
    plt.savefig(ctx.fig_path("2e.svg"))
    plt.close()
    return results


def _softmax(z):
    e = np.exp(z - z.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _norm(p):
    return p / p.sum(-1, keepdims=True)


if __name__ == "__main__":
    args = standard_parser(__doc__).parse_args()
    ctx = context_from_args(args)
    posterior_linear_model(ctx)
    posterior_non_linear_model(ctx, img_kept=0.5)
    posterior_non_linear_model(ctx, img_kept=1.0)
    comparison_ideal_observer(ctx)
