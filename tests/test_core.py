"""Core semantics tests: forward/energy, losses, schedules, init fns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.core.schedule import build_plan, parse_schedule


def small_model():
    return mcpc.PCModel(
        [
            mcpc.Linear(2, 2),
            mcpc.PC(),
            mcpc.Activation("tanh"),
            mcpc.Linear(2, 3),
        ]
    )


def test_forward_energy_and_output(key):
    m = small_model()
    params = m.init(key)
    x0 = jnp.array([[0.5, -0.5], [1.0, 2.0]])
    latents = (x0,)
    inputs = jnp.zeros((2, 2))
    res = m.apply(params, latents, inputs)
    mu = inputs @ params[0]["w"] + params[0]["b"]
    expected_energy = 0.5 * jnp.sum((mu - x0) ** 2)
    assert jnp.allclose(res.energies[0], expected_energy)
    # PC layer forwards x, not mu
    h = jnp.tanh(x0)
    out = h @ params[1]["w"] + params[1]["b"]
    assert jnp.allclose(res.output, out, atol=1e-6)
    # per-datapoint energy sums to total
    assert jnp.allclose(
        jnp.sum(res.energies_per_datapoint[0]), expected_energy
    )
    assert res.energies_per_datapoint[0].shape == (2, 1)


def test_eval_mode_is_identity(key):
    m = small_model()
    params = m.init(key)
    inputs = jnp.ones((4, 2))
    out = m.predict(params, inputs)
    mu = inputs @ params[0]["w"] + params[0]["b"]
    expected = jnp.tanh(mu) @ params[1]["w"] + params[1]["b"]
    assert jnp.allclose(out, expected, atol=1e-6)


def test_m_mask_energy(key):
    M = (1.0, 0.0)
    m = mcpc.PCModel([mcpc.Linear(2, 2), mcpc.PC(M=M), mcpc.Linear(2, 2)])
    params = m.init(key)
    x0 = jnp.array([[1.0, 5.0]])
    inputs = jnp.zeros((1, 2))
    res = m.apply(params, (x0,), inputs)
    mu = params[0]["b"][None]
    expected = 0.5 * (mu[0, 0] - 1.0) ** 2  # second entry masked out
    assert jnp.allclose(res.energies[0], expected)


def test_s_mask_matches_identity_when_eye(key):
    S = tuple(tuple(r) for r in np.eye(2))
    m_s = mcpc.PCModel([mcpc.Linear(2, 2), mcpc.PC(S=S), mcpc.Linear(2, 2)])
    m_plain = mcpc.PCModel([mcpc.Linear(2, 2), mcpc.PC(), mcpc.Linear(2, 2)])
    params = m_plain.init(key)
    x0 = jnp.array([[1.0, -2.0], [0.0, 3.0]])
    inputs = jnp.zeros((2, 2))
    e_s = m_s.apply(params, (x0,), inputs).energies[0]
    e_p = m_plain.apply(params, (x0,), inputs).energies[0]
    assert jnp.allclose(e_s, e_p, atol=1e-6)


def test_losses_match_reference_definitions():
    out = jnp.array([[0.3, -1.2, 2.0]])
    tgt = jnp.array([[0.0, 1.0, 1.0]])
    # Gaussian
    assert jnp.allclose(
        mcpc.fe_fn(out, tgt, 2.0), 0.5 / 2.0 * jnp.sum((out - tgt) ** 2)
    )
    # Bernoulli-with-logits vs manual stable formula
    z, y = out, tgt
    manual = jnp.sum(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))
    assert jnp.allclose(mcpc.bernoulli_fn(out, tgt), manual)
    # masked variants clamp the last round(D*perc) features
    full = mcpc.fe_fn(out[:, -2:], tgt[:, -2:], 1.0)
    assert jnp.allclose(mcpc.fe_fn_mask(out, tgt, 1.0, perc=0.5), full)
    assert jnp.allclose(mcpc.zero_fn(out), 0.0)


def test_bernoulli_matches_torch():
    torch = pytest.importorskip("torch")
    z = np.random.RandomState(0).randn(4, 7).astype(np.float32)
    y = (np.random.RandomState(1).rand(4, 7) > 0.5).astype(np.float32)
    ours = float(mcpc.bernoulli_fn(jnp.asarray(z), jnp.asarray(y)))
    theirs = float(
        torch.nn.BCEWithLogitsLoss(reduction="sum")(
            torch.tensor(z), torch.tensor(y)
        )
    )
    assert abs(ours - theirs) < 1e-3


def test_schedule_parsing():
    assert parse_schedule("all", 4) == (0, 1, 2, 3)
    assert parse_schedule("last", 4) == (3,)
    assert parse_schedule("last_half", 4) == (2, 3)
    assert parse_schedule("never", 4) == ()
    assert parse_schedule([3, 1], 4) == (1, 3)


def test_plan_mcpc_segments():
    # MCPC: T = mixing + sampling, accumulate over the sampling window,
    # single p update at the last step (training_evaluation.py:43-56).
    mixing, sampling = 3, 5
    T = mixing + sampling
    plan = build_plan(
        T,
        update_x_at="all",
        update_p_at="last",
        accumulate_p_at=list(range(mixing, T)),
    )
    assert plan.p_zero_steps == (mixing,)
    assert plan.p_grad_needed == (False,) * mixing + (True,) * sampling
    assert len(plan.segments) == 2
    s0, s1 = plan.segments
    assert (s0.start, s0.length, s0.with_p_grads, s0.p_update_at_end) == (
        0,
        mixing,
        False,
        False,
    )
    assert (s1.start, s1.length, s1.with_p_grads, s1.p_update_at_end) == (
        mixing,
        sampling,
        True,
        True,
    )
    assert plan.p_divisor_steps == sampling


def test_plan_pc_last():
    plan = build_plan(6, update_x_at="all", update_p_at="last")
    assert plan.p_grad_needed == (False,) * 5 + (True,)
    assert plan.segments[-1].p_update_at_end
    assert plan.p_divisor_steps == 1


def test_init_fns(key):
    mu = jnp.zeros((8, 3))
    u = mcpc.sample_x_fn({"mu": mu, "x": None, "key": key})
    assert u.shape == mu.shape and float(u.min()) >= -10 and float(u.max()) <= 10
    n = mcpc.sample_x_fn_normal({"mu": mu, "x": None, "key": key})
    assert n.shape == mu.shape
    c = mcpc.sample_x_fn_cte({"mu": mu, "x": None, "key": None})
    assert jnp.allclose(c, 3.0)


def test_sequential_latent_sampling(key):
    # init_latents must feed each freshly sampled x into the next layer's mu
    m = mcpc.PCModel(
        [
            mcpc.Linear(2, 2),
            mcpc.PC(sample_x_fn=mcpc.core.constant_init),
            mcpc.Linear(2, 3),
            mcpc.PC(),  # default: x = mu
        ]
    )
    params = m.init(key)
    latents = m.init_latents(params, jnp.zeros((1, 2)))
    assert jnp.allclose(latents[0], 3.0)
    mu2 = jnp.full((1, 2), 3.0) @ params[1]["w"] + params[1]["b"]
    assert jnp.allclose(latents[1], mu2, atol=1e-6)


def test_ancestral_sampler_moments(key):
    # Linear(1,1) -> PC -> Linear(1,1): output = w*(b0 + eps) + b,
    # so mean = w*b0 + b and var = w^2 over samples.
    m = mcpc.PCModel([mcpc.Linear(1, 1), mcpc.PC(), mcpc.Linear(1, 1)])
    params = (
        {"w": jnp.array([[0.0]]), "b": jnp.array([1.5])},
        {"w": jnp.array([[2.0]]), "b": jnp.array([0.25])},
    )
    samples = m.ancestral_sample(params, key, 20000)
    assert samples.shape == (20000, 1)
    assert abs(float(samples.mean()) - (2.0 * 1.5 + 0.25)) < 0.05
    assert abs(float(samples.var()) - 4.0) < 0.15
