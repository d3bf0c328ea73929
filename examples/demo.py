"""Demo: perception, learning and generation with MCPC on the 1-D model.

A guided tour of the framework on the exactly-solvable linear-Gaussian model
(the reference's pedagogical example, figure_2.py:29-140):

1. PC perception   — MAP inference on the latent;
2. MCPC perception — Langevin posterior sampling, compared to Bayes' rule;
3. MCPC learning   — the Monte-Carlo Hebbian rule finds W = sqrt(var - 1);
4. generation      — ancestral + unclamped-chain sampling from the model.

Run: python examples/demo.py   (CPU is fine; TPU uses the fused kernel)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import montecarlopredictivecoding_tpu as mcpc

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_demo_cache")


def build_model(mu0=0.5, w=2.0):
    model = mcpc.PCModel(
        [mcpc.Linear(1, 1), mcpc.PC(), mcpc.Linear(1, 1, use_bias=False)]
    )
    params = ({"w": jnp.zeros((1, 1)), "b": jnp.array([mu0])},
              {"w": jnp.array([[w]])})
    return mcpc.GenerativeModel(model, key=0, params=params)


def main():
    mu0, w, var, y = 0.5, 2.0, 1.0, 2.0
    gen = build_model(mu0, w)
    chains = 256
    pseudo = jnp.zeros((chains, 1))
    target = jnp.full((chains, 1), y)
    kwargs = {"_target": target, "_var": var}

    # ---- 1. PC perception: MAP descent ------------------------------------
    pc = mcpc.PCTrainer(gen, T=300, optimizer_x_fn="adam",
                        optimizer_x_kwargs={"lr": 0.05},
                        update_p_at="never", optimizer_p_fn=None)
    pc.train_on_batch(pseudo, loss_fn=mcpc.fe_fn, loss_fn_kwargs=kwargs)
    prec = 1 + w * w / var
    post_mean, post_var = (mu0 + w * y / var) / prec, 1 / prec
    print(f"1. PC MAP        : {float(gen.latents[0].mean()):+.4f}"
          f"   (Bayes posterior mean {post_mean:+.4f})")

    # ---- 2. MCPC perception: Langevin sampling from the MAP ----------------
    sampler = mcpc.PCTrainer(gen, T=3000, optimizer_x_fn="sgd",
                             optimizer_x_kwargs={"lr": 0.01},
                             update_p_at="never", optimizer_p_fn=None)
    res = sampler.train_on_batch(
        pseudo, loss_fn=mcpc.fe_fn, loss_fn_kwargs=kwargs,
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False, is_return_representations=True)
    samples = np.asarray(res["representations"])[500:].ravel()
    print(f"2. MCPC samples  : mean {samples.mean():+.4f} var {samples.var():.4f}"
          f"   (Bayes {post_mean:+.4f} / {post_var:.4f})")

    # ---- 3. MCPC learning: recover the data variance -----------------------
    data_var = 5.0
    gen2 = mcpc.GenerativeModel(
        mcpc.PCModel([mcpc.Linear(1, 1),
                      mcpc.PC(sample_x_fn=mcpc.sample_x_fn_normal),
                      mcpc.Linear(1, 1, use_bias=False)]),
        key=1,
        params=({"w": jnp.zeros((1, 1)), "b": jnp.array([2.0])},
                {"w": jnp.array([[4.0]])}),
    )
    mixing, sampling = 150, 50
    learner = mcpc.PCTrainer(
        gen2, T=mixing + sampling, optimizer_x_fn="sgd",
        optimizer_x_kwargs={"lr": 0.01},
        update_p_at="last", accumulate_p_at=list(range(mixing, mixing + sampling)),
        optimizer_p_fn="adam", optimizer_p_kwargs={"lr": 0.05})
    key = jax.random.PRNGKey(2)
    for i in range(120):
        batch = 1.0 + np.sqrt(data_var) * jax.random.normal(
            jax.random.fold_in(key, i), (chains, 1))
        learner.train_on_batch(
            pseudo, loss_fn=mcpc.fe_fn, loss_fn_kwargs={"_target": batch, "_var": 1.0},
            callback_after_t=mcpc.LangevinStep(var=2.0),
            is_sample_x_at_batch_start=False, is_return_results_every_t=False)
    w_learned = float(gen2.params[1]["w"][0, 0])
    print(f"3. MCPC learning : |W| -> {abs(w_learned):.3f}"
          f"   (fixed point sqrt(var-1) = {np.sqrt(data_var - 1):.3f})")

    # ---- 4. Generation ------------------------------------------------------
    prior_samples = gen.ancestral_sample(5000)
    print(f"4. Ancestral gen : mean {float(prior_samples.mean()):+.4f}"
          f" var {float(prior_samples.var()):.4f}"
          f"   (model marginal {w * mu0:+.4f} / {w * w:.4f} pre-noise)")


if __name__ == "__main__":
    main()
