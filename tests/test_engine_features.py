"""Engine feature tests: dynamic x-lr, early stop, loss_x/loss_inputs,
input optimization, schedule variants, capture options."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlopredictivecoding_tpu as mcpc


def _gen(key=0):
    m = mcpc.PCModel([mcpc.Linear(2, 2), mcpc.PC(), mcpc.Linear(2, 3)])
    return mcpc.GenerativeModel(m, key=key)


def _kwargs(B=4, key=1):
    data = jax.random.normal(jax.random.PRNGKey(key), (B, 3))
    return jnp.zeros((B, 2)), {"_target": data, "_var": 1.0}


def test_dynamic_x_lr_discounts_on_non_decrease():
    gen = _gen()
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=30, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.5},
        x_lr_discount=0.5, update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)
    lr_scales = np.asarray(res["x_lr_scale"])
    # huge lr -> oscillation -> discounts fire -> final scale well below 1
    assert lr_scales[-1] < 1.0
    assert np.all(np.diff(lr_scales) <= 1e-9)  # no amplifier: non-increasing
    # final overall lower than initial thanks to annealing
    ov = np.asarray(res["overall"])
    assert ov[-1] < ov[0]


def test_dynamic_x_lr_amplifier():
    gen = _gen()
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=20, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 1e-4},
        x_lr_amplifier=1.5, update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)
    # tiny lr -> monotone decrease -> amplifier grows the scale
    assert float(res["x_lr_scale"][-1]) > 1.0


def test_early_stop_freezes_chain():
    gen = _gen()
    inputs, lk = _kwargs()

    def stop_after_5(t, loss, energy, overall):
        return t >= 5

    tr = mcpc.PCTrainer(
        gen, T=20, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None, early_stop_fn=stop_after_5,
    )
    res = tr.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)
    assert int(res["stop_t"]) == 5
    ov = np.asarray(res["overall"])
    # frozen after the stop step: all later overalls identical
    assert np.allclose(ov[6:], ov[6])
    assert not np.allclose(ov[4], ov[5])


def test_early_stop_p_update_semantics():
    """With update_p_at_early_stop=True the single weight update uses the
    gradients accumulated up to the stop step."""
    inputs, lk = _kwargs()

    def no_stop(t, loss, energy, overall):
        return jnp.asarray(False)

    def stop_at_3(t, loss, energy, overall):
        return t >= 3

    results = {}
    for name, stop_fn, T in (("stopped", stop_at_3, 10), ("short", no_stop, 4)):
        gen = _gen(key=7)
        tr = mcpc.PCTrainer(
            gen, T=T, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.05},
            update_p_at="last", optimizer_p_fn="sgd",
            optimizer_p_kwargs={"lr": 0.1}, early_stop_fn=stop_fn,
        )
        tr.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)
        results[name] = gen.params
    # chain stopped at t=3 (inclusive updates) == chain of exactly T=4 steps
    for p1, p2 in zip(results["stopped"], results["short"]):
        np.testing.assert_allclose(
            np.asarray(p1["w"]), np.asarray(p2["w"]), atol=1e-6
        )


def test_loss_x_fn_penalizes_latents():
    inputs, lk = _kwargs()
    gen_plain = _gen(key=3)
    gen_pen = _gen(key=3)
    common = dict(
        T=100, optimizer_x_fn="adam", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None,
    )
    tr1 = mcpc.PCTrainer(gen_plain, **common)
    tr2 = mcpc.PCTrainer(gen_pen, loss_x_fn=lambda x: 10.0 * jnp.abs(x), **common)
    tr1.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)
    tr2.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)
    n_plain = float(jnp.abs(gen_plain.latents[0]).sum())
    n_pen = float(jnp.abs(gen_pen.latents[0]).sum())
    assert n_pen < n_plain  # sparsity penalty shrinks latents


def test_optimize_inputs():
    gen = _gen(key=4)
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=50, optimizer_x_fn="adam", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk, is_optimize_inputs=True
    )
    assert "optimized_inputs" in res
    assert not np.allclose(np.asarray(res["optimized_inputs"]), 0.0)


def test_optimize_inputs_last_only_keeps_batch():
    """'optimized_inputs' is batch-leading [B, D]; last-only post-processing
    must not slice it down to [1, D] (ADVICE r1, trainer.py last_only)."""
    gen = _gen(key=4)
    B = 3
    inputs, lk = _kwargs(B=B)
    tr = mcpc.PCTrainer(
        gen, T=50, optimizer_x_fn="adam", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk,
        is_optimize_inputs=True, is_return_results_every_t=False,
    )
    assert res["optimized_inputs"].shape == (B, 2)
    assert res["overall"].shape == (1,)


def test_update_x_at_last_half():
    gen = _gen(key=5)
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=10, update_x_at="last_half",
        optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.1},
        update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)
    ov = np.asarray(res["overall"])
    # first half: latents frozen -> overall constant; second half: decreasing
    assert np.allclose(ov[:5], ov[0])
    assert ov[-1] < ov[5]


def test_capture_options_and_stride():
    gen = _gen(key=6)
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=12, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk,
        is_return_outputs=True, is_return_xs=True,
        is_return_representations=True, capture_stride=3,
    )
    assert res["outputs"].shape == (4, 4, 3)  # T/stride, B, D
    assert res["representations"].shape == (4, 4, 2)
    assert res["xs"][0].shape == (4, 4, 2)
    # last-only mode
    res2 = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk,
        is_return_results_every_t=False,
    )
    assert res2["overall"].shape == (1,)


def test_overall_elementwise():
    gen = _gen(key=8)
    B = 4
    data = (jax.random.uniform(jax.random.PRNGKey(9), (B, 3)) > 0.5).astype(
        jnp.float32
    )
    tr = mcpc.PCTrainer(
        gen, T=5, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(
        jnp.zeros((B, 2)), loss_fn=mcpc.bernoulli_fn,
        loss_fn_kwargs={"_target": data}, is_return_batchelement_loss=True,
    )
    elem = np.asarray(res["overall_elementwise"])  # [T, B]
    assert elem.shape == (5, B)
    np.testing.assert_allclose(
        elem.sum(axis=1), np.asarray(res["overall"]), rtol=1e-5
    )


def test_masked_loss_with_explicit_perc():
    """'perc' (and '_reduction') must be baked in statically, not traced —
    regression for the masked-posterior experiments (figure_2.py:227-228)."""
    gen = _gen(key=11)
    B = 4
    data = (jax.random.uniform(jax.random.PRNGKey(12), (B, 3)) > 0.5).astype(
        jnp.float32
    )
    tr = mcpc.PCTrainer(
        gen, T=5, optimizer_x_fn="adam", optimizer_x_kwargs={"lr": 0.1},
        update_p_at="never", optimizer_p_fn=None,
    )
    res = tr.train_on_batch(
        jnp.zeros((B, 2)),
        loss_fn=mcpc.bernoulli_fn_mask,
        loss_fn_kwargs={"_target": data, "_var": None, "perc": 0.5},
    )
    assert np.isfinite(np.asarray(res["overall"])).all()
    # and the cached partial keeps the jit cache warm across calls
    n_fns = len(tr._fns)
    tr.train_on_batch(
        jnp.zeros((B, 2)),
        loss_fn=mcpc.bernoulli_fn_mask,
        loss_fn_kwargs={"_target": data, "_var": None, "perc": 0.5},
    )
    assert len(tr._fns) == n_fns


def test_trainer_utility_surface():
    """Reference PCTrainer getter parity (pc_trainer.py:312-461)."""
    gen = _gen(key=13)
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=5, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.1},
        update_p_at="never", optimizer_p_fn=None,
    )
    tr.train_on_batch(inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk)

    assert tr.get_is_model_has_pc_layers()
    assert len(tr.get_model_pc_layers()) == 1
    assert tr.get_named_model_pc_layers()[0][0] == "modules[1]"
    assert tr.get_least_T() == 2
    xs = tr.get_model_xs_copy()
    assert xs[0].shape == (4, 2)
    assert tr.get_model_representations().shape == (4, 2)
    energies = tr.get_energies()
    assert len(energies) == 1 and np.isfinite(float(energies[0]))
    per_dp = tr.get_energies(is_per_datapoint=True)
    assert per_dp[0].shape == (4, 1)
    np.testing.assert_allclose(float(per_dp[0].sum()), float(energies[0]), rtol=1e-6)
    assert tr.get_numparameters() > 0
    assert tr.get_numparameters(exclude_first_linear=True) < tr.get_numparameters()
    assert len(tr.get_weights_norms_list()) == 2
    tr.set_x_lr(0.05)
    assert abs(tr.get_x_lr() - 0.05) < 1e-6


def test_energy_fn_additional_inputs():
    """energy__ kwargs reach the per-layer energy_fn (reference
    energy_fn_additional_inputs, pc_layer.py:161-270)."""

    def scaled_energy(inputs):
        return inputs["beta"] * 0.5 * (inputs["mu"] - inputs["x"]) ** 2

    m = mcpc.PCModel(
        [mcpc.Linear(2, 2), mcpc.PC(energy_fn=scaled_energy), mcpc.Linear(2, 3)]
    )
    gen = mcpc.GenerativeModel(m, key=14)
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=3, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None,
    )
    res2 = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={**lk, "energy__beta": 2.0},
    )
    gen.latents = None  # resample identically
    res1 = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={**lk, "energy__beta": 1.0},
        key=jax.random.PRNGKey(0),
    )
    # doubling beta doubles the layer energy at t=0 (same initial latents: mu)
    e2 = float(np.asarray(res2["energy"])[0])
    e1 = float(np.asarray(res1["energy"])[0])
    assert abs(e2 - 2 * e1) < 1e-4 or (e1 == 0 and e2 == 0)


def test_capture_stride_multi_segment_global_alignment():
    """With a multi-segment plan (MCPC accumulate window) whose boundary is
    NOT stride-aligned, thinned captures must still equal full[::stride] —
    thinning is anchored at the global step index, not restarted per segment
    (ADVICE r1, engine.py strided capture)."""
    mixing, T, stride = 4, 11, 3  # segment boundary 4 % 3 != 0

    def make():
        gen = _gen(key=21)
        tr = mcpc.PCTrainer(
            gen, T=T, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.05},
            update_p_at="last", optimizer_p_fn="adam",
            optimizer_p_kwargs={"lr": 0.01},
            accumulate_p_at=list(range(mixing, T)),
        )
        return gen, tr

    inputs, lk = _kwargs()
    _, tr_full = make()
    res_full = tr_full.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk, is_return_xs=True,
        key=jax.random.PRNGKey(7),
    )
    _, tr_thin = make()
    res_thin = tr_thin.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk, is_return_xs=True,
        capture_stride=stride, key=jax.random.PRNGKey(7),
    )
    full = np.asarray(res_full["xs"][0])
    thin = np.asarray(res_thin["xs"][0])
    assert thin.shape[0] == 4  # t = 0, 3, 6, 9
    np.testing.assert_allclose(thin, full[::stride], atol=1e-6)


def test_langevin_noise_scales_with_set_x_lr():
    """Reference random_step applies the noise through optimizer.step() at
    the CURRENT param-group lr, so set_x_lr scales BOTH the gradient step and
    the effective noise std; with identical keys the one-step increment under
    2x lr is exactly 2x the baseline increment (ADVICE r1, engine.py noise)."""
    lr0 = 0.01

    def one_step(scale):
        gen = _gen(key=23)
        tr = mcpc.PCTrainer(
            gen, T=1, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": lr0},
            update_p_at="never", optimizer_p_fn=None,
        )
        if scale != 1.0:
            tr.set_x_lr(lr0 * scale)
        inputs, lk = _kwargs()
        gen.sample_latents(inputs, jax.random.PRNGKey(5))
        x0 = np.asarray(gen.latents[0])
        tr.train_on_batch(
            inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk,
            callback_after_t=mcpc.LangevinStep(var=2.0),
            is_sample_x_at_batch_start=False,
            key=jax.random.PRNGKey(3),
        )
        return np.asarray(gen.latents[0]) - x0

    d1 = one_step(1.0)
    d2 = one_step(2.0)
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5, atol=1e-7)


def test_capture_stride_with_remainder():
    """T not divisible by the stride still captures at t % stride == 0
    (including the final partial chunk's leading step)."""
    gen = _gen(key=15)
    inputs, lk = _kwargs()
    tr = mcpc.PCTrainer(
        gen, T=11, optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": 0.05},
        update_p_at="never", optimizer_p_fn=None,
    )
    res_full = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk, is_return_xs=True,
        key=jax.random.PRNGKey(1),
    )
    gen.latents = None
    res_thin = tr.train_on_batch(
        inputs, loss_fn=mcpc.fe_fn, loss_fn_kwargs=lk, is_return_xs=True,
        capture_stride=3, key=jax.random.PRNGKey(1),
    )
    full = np.asarray(res_full["xs"][0])
    thin = np.asarray(res_thin["xs"][0])
    assert thin.shape[0] == 4  # t = 0, 3, 6, 9
    np.testing.assert_allclose(thin, full[::3], atol=1e-6)
