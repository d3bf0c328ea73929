"""Sharding tests on the 8-virtual-device CPU mesh: the sharded MCPC train
step must compile, run, and match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.core.engine import (
    EngineConfig,
    EngineState,
    build_train_on_batch,
)
from montecarlopredictivecoding_tpu.core.optim import OptimizerSpec
from montecarlopredictivecoding_tpu.core.schedule import build_plan
from montecarlopredictivecoding_tpu.parallel import make_mesh, shard_train_on_batch
from montecarlopredictivecoding_tpu.parallel.mesh import best_mesh_shape


@pytest.fixture(scope="module")
def setup():
    dims = (8, 16, 16, 32)
    model = mcpc.make_mlp_model(*dims)
    mixing, sampling = 2, 4
    T = mixing + sampling
    cfg = EngineConfig(
        plan=build_plan(
            T,
            update_x_at="all",
            update_p_at="last",
            accumulate_p_at=list(range(mixing, T)),
        ),
        optimizer_x=OptimizerSpec("sgd", lr=0.01),
        optimizer_p=OptimizerSpec("adam", lr=0.001),
        langevin_var=None,  # deterministic so sharded == single-device
        loss_fn=mcpc.bernoulli_fn,
    )
    key = jax.random.PRNGKey(7)
    params = model.init(key)
    batch = 16
    inputs = jnp.zeros((batch, dims[0]))
    latents = model.init_latents(params, inputs, key)
    target = (jax.random.uniform(key, (batch, dims[-1])) > 0.5).astype(
        jnp.float32
    )
    state = EngineState(
        params=params,
        latents=latents,
        opt_x_state=None,
        opt_p_state=None,
        lr_scale=jnp.ones(()),
        key=key,
    )
    return model, cfg, state, inputs, target, dims


def _init_states(cfg, state, inputs):
    xs_tree = {"latents": state.latents}
    opt_x = cfg.optimizer_x.make().init(xs_tree)
    opt_p = cfg.optimizer_p.make().init(state.params)
    return state._replace(opt_x_state=opt_x, opt_p_state=opt_p)


def test_multichip_matches_single_device(setup):
    model, cfg, state, inputs, target, dims = setup
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"

    # single device
    fn = jax.jit(build_train_on_batch(model, cfg))
    s1 = _init_states(cfg, state, inputs)
    new1, res1 = fn(s1, inputs, {"_target": target})

    # 8-device (data x model) mesh
    data_ax, model_ax = best_mesh_shape(8, dims)
    assert model_ax > 1, "tensor-parallel axis should engage for these dims"
    mesh = make_mesh(jax.devices()[:8], data=data_ax, model=model_ax)
    fn8, s8, inp8, kw8 = shard_train_on_batch(
        model, cfg, mesh, state, inputs, {"_target": target}
    )
    new8, res8 = fn8(s8, inp8, kw8)

    np.testing.assert_allclose(
        np.asarray(res1["overall"]), np.asarray(res8["overall"]), rtol=2e-4
    )
    for p1, p8 in zip(new1.params, new8.params):
        np.testing.assert_allclose(
            np.asarray(p1["w"]), np.asarray(p8["w"]), atol=2e-5
        )
    for x1, x8 in zip(new1.latents, new8.latents):
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x8), atol=2e-5
        )


def test_dryrun_multichip_entrypoint():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_from_one_device():
    """From an environment exposing a single device (the driver's tunneled
    TPU), dryrun_multichip(8) must self-provision an 8-virtual-device CPU
    platform in a subprocess (VERDICT r1 Missing #1)."""
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "mesh=(2x4)" in proc.stdout


def test_dryrun_multichip_never_inits_unreachable_tpu():
    """VERDICT r3 missing #1a: dryrun_multichip is a CPU-only check and must
    NEVER initialize the parent process's default (axon TPU) backend — a
    wedged tunneled chip hangs `jax.devices()` for tens of minutes. Simulate
    the driver environment with JAX_PLATFORMS pointing at the (possibly
    unreachable) accelerator platform: the dryrun must go straight to the
    CPU-virtual-device subprocess and succeed without ever touching it."""
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    # The driver exports JAX_PLATFORMS=axon; any attempt to initialize that
    # backend here would raise (plugin absent outside /root/repo's process
    # bootstrap) or hang (wedged chip) — both fail the assertions below.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    code = (
        "import __graft_entry__ as g\n"
        "assert not g._cpu_devices_provisioned(8)\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_cpu_devices_provisioned_env_logic():
    """The provisioning predicate is pure env/config inspection."""
    import importlib.util
    import os
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry3", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # pytest runs under conftest's 8-virtual-device CPU recipe
    assert mod._cpu_devices_provisioned(8)
    assert not mod._cpu_devices_provisioned(16)

    saved = os.environ["XLA_FLAGS"]
    try:
        os.environ["XLA_FLAGS"] = ""
        assert not mod._cpu_devices_provisioned(8)
    finally:
        os.environ["XLA_FLAGS"] = saved


def test_entry_compiles():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    overall, new_latents = out
    assert jnp.isfinite(overall)
    assert len(new_latents) == 3
