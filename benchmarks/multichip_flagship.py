"""Flagship-scale multichip gate (VERDICT r2 weak #5).

The driver's ``dryrun_multichip`` proves compile+collective correctness on
tiny shapes; this gate shards the REAL flagship workload — the
(20, 128, 128, 784) MCPC MNIST model, batch 1024, the table-1 training
chain T = 50 mixing + 100 sampling (reference table_1.py:38-44) — over an
8-virtual-device (data, model) mesh, runs one full training step, and
checks numerical equality against the same step on a single device
(deterministic: noise off).  Also runs the data-parallel fused-kernel path
(per-shard whole-chain kernel + psum of the Monte-Carlo grads) against the
single-shard kernel.

Writes MULTICHIP_builder.json (the builder-run record; the driver captures its own via __graft_entry__.dryrun_multichip).

Run: python benchmarks/multichip_flagship.py     (self-provisions an
8-virtual-device CPU platform, same recipe as tests/conftest.py)
"""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DEVICES = 8
DIMS = (20, 128, 128, 784)
BATCH = 1024
MIXING, SAMPLING = 50, 100


def _body():
    import time

    import jax

    # float64 for the equality legs: the 150-step chain amplifies the
    # sharded matmuls' reduction-reorder noise (f32: ~3e-2 after T=150,
    # observed) — in f64 the same amplification leaves ~1e-10, so the check
    # proves program equivalence rather than fp-noise tolerance
    jax.config.update("jax_enable_x64", True)

    assert len(jax.devices()) >= N_DEVICES, jax.devices()
    import jax.numpy as jnp
    import numpy as np

    import montecarlopredictivecoding_tpu as mcpc
    from montecarlopredictivecoding_tpu.core.engine import (
        EngineConfig,
        EngineState,
        build_train_on_batch,
    )
    from montecarlopredictivecoding_tpu.core.optim import OptimizerSpec
    from montecarlopredictivecoding_tpu.core.schedule import build_plan
    from montecarlopredictivecoding_tpu.parallel import (
        make_mesh,
        shard_train_on_batch,
    )
    from montecarlopredictivecoding_tpu.parallel.fused_dp import (
        make_dp_fused_chain,
        place_dp,
    )
    from montecarlopredictivecoding_tpu.parallel.mesh import best_mesh_shape

    T = MIXING + SAMPLING
    model = mcpc.make_mlp_model(*DIMS)
    cfg = EngineConfig(
        plan=build_plan(
            T, update_x_at="all", update_p_at="last",
            accumulate_p_at=list(range(MIXING, T)),
        ),
        optimizer_x=OptimizerSpec("sgd", lr=0.1),
        optimizer_p=OptimizerSpec("adam", lr=0.01),
        langevin_var=None,  # deterministic: single- vs multi-device equality
        loss_fn=mcpc.bernoulli_fn,
        capture_every_t=False,
    )
    key = jax.random.PRNGKey(0)
    to64 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64), t
    )
    params32 = model.init(key)
    inputs32 = jnp.zeros((BATCH, DIMS[0]), jnp.float32)
    latents32 = model.init_latents(params32, inputs32, key)
    target32 = (jax.random.uniform(key, (BATCH, DIMS[-1])) > 0.5).astype(
        jnp.float32
    )
    params, latents = to64(params32), to64(latents32)
    inputs, target = to64(inputs32), to64(target32)

    def fresh_state():
        return EngineState(
            params=params, latents=latents, opt_x_state=None,
            opt_p_state=None, lr_scale=jnp.ones(()), key=key,
        )

    # -- single-device reference step -------------------------------------
    fn1 = jax.jit(build_train_on_batch(model, cfg))
    st = fresh_state()
    st = st._replace(
        opt_x_state=cfg.optimizer_x.make().init({"latents": latents}),
        opt_p_state=cfg.optimizer_p.make().init(params),
    )
    t0 = time.time()
    ref_state, ref_res = fn1(st, inputs, {"_target": target})
    jax.block_until_ready(ref_state.params)
    t_single = time.time() - t0

    # -- sharded step over the (data, model) mesh --------------------------
    data_ax, model_ax = best_mesh_shape(N_DEVICES, DIMS)
    mesh = make_mesh(jax.devices()[:N_DEVICES], data=data_ax, model=model_ax)
    fn, sstate, sinputs, skwargs = shard_train_on_batch(
        model, cfg, mesh, fresh_state(), inputs, {"_target": target}
    )
    t0 = time.time()
    new_state, res = fn(sstate, sinputs, skwargs)
    jax.block_until_ready(new_state.params)
    t_mesh = time.time() - t0

    diffs = [
        float(np.abs(np.asarray(a["w"]) - np.asarray(b["w"])).max())
        for a, b in zip(new_state.params, ref_state.params)
    ] + [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(new_state.latents, ref_state.latents)
    ]
    max_diff = max(diffs)
    assert max_diff < 1e-7, f"sharded != single-device (max abs diff {max_diff})"
    overall_rel = abs(
        float(res["overall"][-1]) - float(ref_res["overall"][-1])
    ) / abs(float(ref_res["overall"][-1]))
    assert overall_rel < 1e-4, overall_rel

    # -- data-parallel fused-kernel path (interpret off-TPU) ---------------
    interp = jax.default_backend() != "tpu"
    dp_mesh = make_mesh(jax.devices()[:N_DEVICES], data=N_DEVICES, model=1)
    # pin one matmul layout on both sides: auto would pick perlayer for the
    # 1024-row single-device run but blockdiag for the 128-row shards, and
    # the different reduction orders amplify over the 150-step chain
    dp_fn = make_dp_fused_chain(
        model, dp_mesh, T=T, lr=0.1, noise_var=None, loss="bernoulli",
        mixing=MIXING, with_pgrads=True, interpret=interp,
        matmul_layout="blockdiag",
    )
    # the fused kernel is f32 (its production dtype); per-shard chains are
    # row-independent, so dp vs single-shard differs only in the pgrad psum
    p, l, tgt = place_dp(dp_mesh, params32, latents32, target32)
    dp_lat, dp_pg = dp_fn(p, l, tgt, jnp.int32(0))
    jax.block_until_ready(dp_pg)
    from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

    k_lat, k_pg = mcpc_chain_pallas(
        params32, latents32, target32, jnp.int32(0), T=T, lr=0.1,
        noise_var=None, loss="bernoulli", mixing=MIXING, with_pgrads=True,
        interpret=interp, matmul_layout="blockdiag",
    )
    kernel_diff = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(dp_lat, k_lat)
    )
    kernel_pg_diff = max(
        float(np.abs(np.asarray(a["w"]) - np.asarray(b["w"])).max())
        for a, b in zip(dp_pg, k_pg)
    )
    assert kernel_diff < 2e-4, kernel_diff
    assert kernel_pg_diff < 2e-2, kernel_pg_diff  # grads are B*T-scale sums

    # -- noise-ON legs (VERDICT r3 weak #6) --------------------------------
    # (a) noisy sharded engine == noisy single-device engine, f64: the
    # engine's Langevin noise is a GLOBAL jax.random draw (engine.py:268-285),
    # elementwise-deterministic under partitionable threefry, so the mesh
    # program must reproduce the single-device chain exactly — collectives,
    # noise streams and all.
    import dataclasses as _dc

    noisy_cfg = _dc.replace(cfg, langevin_var=2.0)
    fn1n = jax.jit(build_train_on_batch(model, noisy_cfg))
    st = fresh_state()
    st = st._replace(
        opt_x_state=noisy_cfg.optimizer_x.make().init({"latents": latents}),
        opt_p_state=noisy_cfg.optimizer_p.make().init(params),
    )
    ref_n_state, _ = fn1n(st, inputs, {"_target": target})
    jax.block_until_ready(ref_n_state.params)
    fnn, nstate, ninputs, nkwargs = shard_train_on_batch(
        model, noisy_cfg, mesh, fresh_state(), inputs, {"_target": target}
    )
    new_n_state, _ = fnn(nstate, ninputs, nkwargs)
    jax.block_until_ready(new_n_state.params)
    noisy_diff = max(
        [
            float(np.abs(np.asarray(a["w"]) - np.asarray(b["w"])).max())
            for a, b in zip(new_n_state.params, ref_n_state.params)
        ]
        + [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(new_n_state.latents, ref_n_state.latents)
        ]
    )
    assert noisy_diff < 1e-7, f"noisy sharded != single (max {noisy_diff})"

    # (b) stationary noise law PER SHARD over the dp mesh (the kernel_sanity
    # closed form): zero weights make each site's energy 0.5*(x-b)^2, so a
    # long unadjusted Langevin chain is stationary at N(b, 1/(1-lr/2)).
    # Check the law on every 'data'-shard row block independently AND that
    # the shard blocks carry different noise streams.
    from montecarlopredictivecoding_tpu.core.losses import zero_fn

    lr_law, T_law = 0.02, 3000
    law_cfg = _dc.replace(
        cfg,
        plan=build_plan(T_law, update_x_at="all", update_p_at="never"),
        optimizer_x=OptimizerSpec("sgd", lr=lr_law),
        optimizer_p=None,
        langevin_var=2.0,
        loss_fn=zero_fn,
    )
    # f64 end-to-end: with jax_enable_x64 on, mixed f32 state promotes
    # inside the scan carry and fails the carry-type check
    zero_params = tuple(
        {"w": jnp.zeros_like(p["w"]), "b": p["b"]} for p in params
    )
    dp_mesh_law = make_mesh(jax.devices()[:N_DEVICES], data=N_DEVICES, model=1)
    law_state = EngineState(
        params=zero_params, latents=latents, opt_x_state=None,
        opt_p_state=None, lr_scale=jnp.ones(()), key=jax.random.PRNGKey(5),
    )
    fnl, lstate, linputs, lkwargs = shard_train_on_batch(
        model, law_cfg, dp_mesh_law, law_state, inputs,
        {"_target": target},
    )
    law_out, _ = fnl(lstate, linputs, lkwargs)
    jax.block_until_ready(law_out.latents)
    exp_var = 1.0 / (1.0 - lr_law / 2.0)
    shard_B = BATCH // N_DEVICES
    worst_m, worst_v = 0.0, 0.0
    for i, x in enumerate(law_out.latents):
        b = np.asarray(zero_params[i]["b"])
        d = np.asarray(x) - b[None, :]
        blocks = [
            d[s * shard_B : (s + 1) * shard_B] for s in range(N_DEVICES)
        ]
        for s, blk in enumerate(blocks):
            m, v = float(blk.mean()), float(blk.var())
            worst_m = max(worst_m, abs(m))
            worst_v = max(worst_v, abs(v - exp_var) / exp_var)
            assert abs(m) < 0.1, (i, s, m)
            assert abs(v - exp_var) < 0.1 * exp_var, (i, s, v, exp_var)
        # different shard row blocks must hold different noise streams
        for s in range(N_DEVICES - 1):
            assert not np.allclose(blocks[s][:4], blocks[s + 1][:4]), (i, s)

    out = {
        "ok": True,
        "dims": list(DIMS),
        "batch": BATCH,
        "T": T,
        "mesh": f"{data_ax}x{model_ax} (data x model)",
        "n_devices": N_DEVICES,
        "engine_max_abs_diff_vs_single": max_diff,
        "dp_kernel_max_abs_diff_vs_single": kernel_diff,
        "dp_kernel_pgrad_max_abs_diff": kernel_pg_diff,
        "noisy_engine_max_abs_diff_vs_single": noisy_diff,
        "noise_law_worst_mean_abs": round(worst_m, 4),
        "noise_law_worst_var_rel": round(worst_v, 4),
        "noise_law_expected_var": round(exp_var, 4),
        "t_single_s": round(t_single, 2),
        "t_mesh_s": round(t_mesh, 2),
        "platform": jax.default_backend(),
    }
    print(json.dumps(out))


def main():
    # self-provision a virtual 8-device CPU platform in a subprocess (the
    # surrounding env tunnels a single TPU chip)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()
    code = (
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "import multichip_flagship as m\n"
        "m._body()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=3600,
    )
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"flagship multichip gate failed rc={proc.returncode}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    with open(os.path.join(REPO, "MULTICHIP_builder.json"), "w") as f:
        f.write(line + "\n")
    print("wrote MULTICHIP_builder.json")


if __name__ == "__main__":
    main()
