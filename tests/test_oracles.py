"""Analytical oracles from the reference figure scripts (SURVEY.md §4):

* 1-D linear-Gaussian model: PC inference must land on the closed-form
  posterior MAP; MCPC Langevin samples must match the closed-form posterior
  moments (reference figure_2.py:77-96).
* Unclamped generation: samples from the joint must match the closed-form
  marginal ``p(x0) = N(w*mu + b, w^2 + var)`` (reference figure_3.py:75-91).
* Langevin update law: x <- x - lr*dE/dx + N(0, lr*var).
"""

import jax
import jax.numpy as jnp
import numpy as np

import montecarlopredictivecoding_tpu as mcpc


def linear_model(mu0=1.0, w=2.0, b=0.0):
    """Generative model: x1 ~ N(mu0, 1); x0 ~ N(w*x1 + b, var)."""
    m = mcpc.PCModel([mcpc.Linear(1, 1), mcpc.PC(), mcpc.Linear(1, 1)])
    params = (
        {"w": jnp.zeros((1, 1)), "b": jnp.array([mu0])},
        {"w": jnp.array([[w]]), "b": jnp.array([b])},
    )
    return m, params


def analytic_posterior(x0, mu0, w, b, var):
    prec = 1.0 + w * w / var
    mean = (mu0 + w * (x0 - b) / var) / prec
    return mean, 1.0 / prec


def test_pc_inference_finds_map():
    mu0, w, b, var, x0 = 1.0, 2.0, 0.5, 0.3, 2.0
    m, params = linear_model(mu0, w, b)
    gen = mcpc.GenerativeModel(m, key=0, params=params)
    trainer = mcpc.PCTrainer(
        gen,
        T=300,
        update_x_at="all",
        optimizer_x_fn="adam",
        optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    batch = 16
    inputs = jnp.zeros((batch, 1))
    target = jnp.full((batch, 1), x0)
    results = trainer.train_on_batch(
        inputs,
        loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={"_target": target, "_var": var},
    )
    mean, _ = analytic_posterior(x0, mu0, w, b, var)
    assert np.allclose(np.asarray(gen.latents[0]), mean, atol=1e-3)
    # overall energy decreases
    ov = np.asarray(results["overall"])
    assert ov[-1] < ov[0]


def test_mcpc_posterior_moments():
    mu0, w, b, var, x0 = 1.0, 2.0, 0.0, 1.0, 2.0
    m, params = linear_model(mu0, w, b)
    gen = mcpc.GenerativeModel(m, key=1, params=params)
    chains = 512
    inputs = jnp.zeros((chains, 1))
    target = jnp.full((chains, 1), x0)

    # PC warm start (reference pattern utils/model.py:121-149)
    pc_tr = mcpc.PCTrainer(
        gen,
        T=200,
        optimizer_x_fn="adam",
        optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    pc_tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs={"_target": target, "_var": var}
    )

    mixing, sampling = 200, 3000
    mcpc_tr = mcpc.PCTrainer(
        gen,
        T=mixing + sampling,
        optimizer_x_fn="sgd",
        optimizer_x_kwargs={"lr": 0.01},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    results = mcpc_tr.train_on_batch(
        inputs,
        loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={"_target": target, "_var": var},
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False,
        is_return_representations=True,
    )
    samples = np.asarray(results["representations"])[mixing:].reshape(-1)
    mean, varp = analytic_posterior(x0, mu0, w, b, var)
    assert abs(samples.mean() - mean) < 0.02
    assert abs(samples.var() - varp) < 0.02


def test_mcpc_unclamped_marginal():
    # Generation: unclamped chain (zero_fn loss) with an output PC layer so
    # the sensory unit itself is sampled (reference figure_3.py:47-55).
    mu0, w, b, var = 1.0, 1.5, 0.0, 1.0
    m = mcpc.PCModel(
        [
            mcpc.Linear(1, 1),
            mcpc.PC(),
            mcpc.Linear(1, 1),
            mcpc.PC(energy_fn=mcpc.scaled_gaussian_energy(var)),
        ]
    )
    params = (
        {"w": jnp.zeros((1, 1)), "b": jnp.array([mu0])},
        {"w": jnp.array([[w]]), "b": jnp.array([b])},
    )
    gen = mcpc.GenerativeModel(m, key=2, params=params)
    chains = 512
    inputs = jnp.zeros((chains, 1))

    pc_tr = mcpc.PCTrainer(
        gen,
        T=100,
        optimizer_x_fn="adam",
        optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    pc_tr.train_on_batch(inputs, loss_fn=None)

    mixing, sampling = 300, 3000
    tr = mcpc.PCTrainer(
        gen,
        T=mixing + sampling,
        optimizer_x_fn="sgd",
        optimizer_x_kwargs={"lr": 0.01},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    results = tr.train_on_batch(
        inputs,
        loss_fn=None,
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False,
        is_return_xs=True,
    )
    # the sensory latent is the second PC layer
    x0_samples = np.asarray(results["xs"][1])[mixing:].reshape(-1)
    assert abs(x0_samples.mean() - (w * mu0 + b)) < 0.05
    assert abs(x0_samples.var() - (w * w + var)) < 0.12


def test_langevin_update_law():
    # One step with zero gradient: x' - x ~ N(0, lr*var) exactly.
    m = mcpc.PCModel([mcpc.Linear(1, 1), mcpc.PC(), mcpc.Linear(1, 1)])
    params = (
        {"w": jnp.zeros((1, 1)), "b": jnp.zeros((1,))},
        {"w": jnp.zeros((1, 1)), "b": jnp.zeros((1,))},
    )
    gen = mcpc.GenerativeModel(m, key=3, params=params)
    n = 20000
    inputs = jnp.zeros((n, 1))
    gen.latents = (jnp.zeros((n, 1)),)  # mu == x == 0 -> dE/dx = 0
    lr, var = 0.04, 2.0
    tr = mcpc.PCTrainer(
        gen,
        T=1,
        optimizer_x_fn="sgd",
        optimizer_x_kwargs={"lr": lr},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    tr.train_on_batch(
        inputs,
        loss_fn=mcpc.zero_fn,
        callback_after_t=mcpc.LangevinStep(var=var),
        is_sample_x_at_batch_start=False,
    )
    dx = np.asarray(gen.latents[0]).reshape(-1)
    assert abs(dx.mean()) < 0.01
    assert abs(dx.var() - lr * var) < 0.005
