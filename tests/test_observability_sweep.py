"""Tests for the observability kit and the vmapped seed-sweep layer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.core.engine import EngineConfig, build_train_on_batch, EngineState
from montecarlopredictivecoding_tpu.core.optim import OptimizerSpec
from montecarlopredictivecoding_tpu.core.schedule import build_plan
from montecarlopredictivecoding_tpu.parallel.sweep import (
    make_seed_states,
    stack_pytrees,
    vmap_train_on_batch,
)
from montecarlopredictivecoding_tpu.utils.observability import (
    ProgressLogger,
    energy_absorption_report,
    plot_progress,
)


def _run_results():
    gen = mcpc.GenerativeModel(
        mcpc.PCModel([mcpc.Linear(2, 2), mcpc.PC(), mcpc.Linear(2, 3)]), key=0
    )
    tr = mcpc.PCTrainer(
        gen, T=30, optimizer_x_fn="adam", optimizer_x_kwargs={"lr": 0.1},
        update_p_at="never", optimizer_p_fn=None,
    )
    out = []
    for k in range(3):
        data = jax.random.normal(jax.random.PRNGKey(k), (4, 3))
        out.append(
            tr.train_on_batch(
                jnp.zeros((4, 2)), loss_fn=mcpc.fe_fn,
                loss_fn_kwargs={"_target": data, "_var": 1.0},
            )
        )
    return out


def test_progress_logger_and_reports(tmp_path, capsys):
    results = _run_results()
    log = ProgressLogger(every=1)
    for r in results:
        log(r, T=30)
    captured = capsys.readouterr().out
    assert "h=0" in captured and "steps/s" in captured
    assert len(log.history) == 3

    rep = energy_absorption_report(results)
    # loss is absorbed into hidden energy: positive absorption, mostly
    # monotone overall
    assert rep["mean_absorption"] > 0
    assert rep["mean_overall_monotone_frac"] > 0.7  # Adam lr 0.1 oscillates a little

    path = plot_progress(results, path=str(tmp_path / "progress.png"))
    assert os.path.getsize(path) > 0


def test_vmapped_seed_sweep_matches_sequential():
    model = mcpc.make_mlp_model(4, 8, 8, 16)
    T = 10
    cfg = EngineConfig(
        plan=build_plan(T, "all", "last", list(range(4, T))),
        optimizer_x=OptimizerSpec("sgd", lr=0.02),
        optimizer_p=OptimizerSpec("adam", lr=0.01),
        langevin_var=None,  # deterministic for exact comparison
        loss_fn=mcpc.bernoulli_fn,
        capture_every_t=False,
    )
    key = jax.random.PRNGKey(0)
    params_list = [model.init(jax.random.fold_in(key, i)) for i in range(3)]
    B = 8
    inputs = jnp.zeros((B, 4))
    target = (jax.random.uniform(key, (B, 16)) > 0.5).astype(jnp.float32)

    stacked = make_seed_states(model, cfg, params_list, inputs, key)
    vfn = vmap_train_on_batch(model, cfg)
    new_stacked, res = vfn(stacked, inputs, {"_target": target})
    assert res["overall"].shape == (3, T)

    # sequential reference
    fn = jax.jit(build_train_on_batch(model, cfg))
    seq_states = jax.tree_util.tree_map(lambda x: list(x), stacked)
    for i in range(3):
        st = jax.tree_util.tree_map(lambda x: x[i], stacked)
        ns, r = fn(st, inputs, {"_target": target})
        for a, b in zip(ns.latents, new_stacked.latents):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b[i]), atol=1e-5
            )
        for pa, pb in zip(ns.params, new_stacked.params):
            np.testing.assert_allclose(
                np.asarray(pa["w"]), np.asarray(pb["w"][i]), atol=1e-5
            )


def test_stack_pytrees():
    trees = [{"a": jnp.ones((2,)) * i} for i in range(4)]
    out = stack_pytrees(trees)
    assert out["a"].shape == (4, 2)
    assert float(out["a"][2, 0]) == 2.0


def test_sweep_warm_langevin_chains_matches_sequential():
    """The figure-5 sweep helper (PC warm start + Langevin chain with xs
    capture, seeds as a vmapped axis) equals the per-seed sequential engine
    flow given identical keys (VERDICT r1 item 7)."""
    from montecarlopredictivecoding_tpu.parallel.sweep import (
        sweep_warm_langevin_chains,
    )

    config = {
        "input_size": 3, "hidden_size": 4, "hidden2_size": 4,
        "output_size": 6, "loss_fn": mcpc.bernoulli_fn,
        "activation_fn": "relu", "input_var": None,
        "T_pc": 8, "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.1},
        "mixing": 3, "sampling": 7,
        "optimizer_x_kwargs_mcpc": {"lr": 0.05},
    }
    model = mcpc.make_mlp_model(3, 4, 4, 6)
    S, B = 2, 4
    params_list = [model.init(jax.random.PRNGKey(i)) for i in range(S)]
    inputs = jnp.zeros((B, 3))
    target = (jax.random.uniform(jax.random.PRNGKey(9), (B, 6)) > 0.5).astype(
        jnp.float32
    )
    key = jax.random.PRNGKey(42)
    stride = 2

    xs_sweep = sweep_warm_langevin_chains(
        model, params_list, config, target, inputs, key, stride=stride
    )

    # sequential replication with the same per-seed key stream
    keys = jax.random.split(key, 2 * S)
    cfg_pc = EngineConfig(
        plan=build_plan(config["T_pc"], "all", "never"),
        optimizer_x=OptimizerSpec("adam", lr=0.1),
        optimizer_p=None, loss_fn=mcpc.bernoulli_fn, capture_every_t=False,
    )
    T_mc = config["mixing"] + config["sampling"]
    cfg_mc = EngineConfig(
        plan=build_plan(T_mc, "all", "never"),
        optimizer_x=OptimizerSpec("sgd", lr=0.05),
        optimizer_p=None, langevin_var=2.0, loss_fn=mcpc.bernoulli_fn,
        capture_every_t=True, capture_xs=True, capture_stride=stride,
    )
    warm_fn = jax.jit(build_train_on_batch(model, cfg_pc))
    chain_fn = jax.jit(build_train_on_batch(model, cfg_mc))
    kwargs = {"_target": target}
    for s in range(S):
        latents = model.init_latents(params_list[s], inputs, keys[s])
        st = EngineState(
            params=params_list[s], latents=latents,
            opt_x_state=cfg_pc.optimizer_x.make().init({"latents": latents}),
            opt_p_state=None, lr_scale=jnp.ones(()), key=keys[S + s],
        )
        st, _ = warm_fn(st, inputs, kwargs)
        st = EngineState(
            params=st.params, latents=st.latents,
            opt_x_state=cfg_mc.optimizer_x.make().init({"latents": st.latents}),
            opt_p_state=None, lr_scale=jnp.ones(()),
            key=jax.random.fold_in(st.key, 1),
        )
        _, res = chain_fn(st, inputs, kwargs)
        for li in range(3):
            np.testing.assert_allclose(
                np.asarray(xs_sweep[li][s]), np.asarray(res["xs"][li]),
                atol=2e-5,
            )


def test_slow_down_warning_direct():
    from montecarlopredictivecoding_tpu.utils.observability import (
        slow_down_warning,
    )

    with pytest.warns(RuntimeWarning, match="slows down training"):
        slow_down_warning("PCTrainer.train_on_batch", "is_log_progress", "False")


def test_profile_trace_writes_trace(tmp_path):
    from montecarlopredictivecoding_tpu.utils.observability import profile_trace

    log_dir = str(tmp_path / "trace")
    with profile_trace(log_dir) as d:
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        x.block_until_ready()
    import pathlib

    files = [p for p in pathlib.Path(d).rglob("*") if p.is_file()]
    assert files, "profiler trace directory is empty"


def _fallback_trainer(energy_coefficient=2.0):
    gen = mcpc.GenerativeModel(mcpc.make_mlp_model(4, 8, 8, 12), key=0)
    tr = mcpc.PCTrainer(
        gen,
        T=5,
        optimizer_x_fn="sgd",
        optimizer_x_kwargs={"lr": 0.01},
        update_p_at="never",
        optimizer_p_fn=None,
        energy_coefficient=energy_coefficient,
    )
    return gen, tr


def _fallback_batch(tr, **kw):
    return tr.train_on_batch(
        jnp.zeros((2, 4)),
        loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={"_target": jnp.zeros((2, 12)), "_var": 1.0},
        **kw,
    )


def test_kernel_fallback_warns_once_per_reason():
    """use_pallas=True with a kernel-ineligible option must surface the
    disqualifying option through slow_down_warning — once per reason (the
    reference warns about slow options on every call; here the slow path is
    the scan-engine fallback)."""
    import warnings as w

    _, tr = _fallback_trainer(energy_coefficient=2.0)
    tr.use_pallas = True
    with pytest.warns(RuntimeWarning, match="energy_coefficient"):
        _fallback_batch(tr)
    # second call, same reason: silent
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        _fallback_batch(tr)
    assert not [r for r in rec if "scan engine" in str(r.message)]
    # a different disqualifier warns again
    def custom_loss(output, _target, _var):
        return jnp.sum((output - _target) ** 2)

    with pytest.warns(RuntimeWarning, match="unsupported loss_fn"):
        tr.energy_coefficient = 1.0
        tr.train_on_batch(
            jnp.zeros((2, 4)),
            loss_fn=custom_loss,
            loss_fn_kwargs={"_target": jnp.zeros((2, 12)), "_var": 1.0},
        )


def test_kernel_fallback_silent_on_cpu_auto():
    """'auto' on a CPU backend is not a fallback — no warning."""
    import warnings as w

    _, tr = _fallback_trainer(energy_coefficient=2.0)
    assert tr.use_pallas == "auto"
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        _fallback_batch(tr)
    assert not [r for r in rec if "scan engine" in str(r.message)]
