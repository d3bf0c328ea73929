"""Benchmark: MCPC Langevin inference steps/sec/chip on the MNIST MLP.

Workload — the reference's posterior-inference chain at full scale
(figure_2.py:167-173: 1000 mixing + 9000 sampling Langevin steps): generative
MLP 20-128-128-784, batch 256 chains, Bernoulli sensory loss, plain-SGD
Langevin steps (grad + N(0, 2*lr) noise) — identical math to the reference's
``random_step`` MCPC loop (utils/model.py:35-44).

Engine: the fused whole-chain Pallas kernel (ops/pallas_mcpc.py) — weights,
latents and RNG stay in VMEM for all T steps.  Timing includes dispatch and
host readback (one call = one full chain), median of 5.

Baseline: the reference PyTorch implementation on CPU measured with
benchmarks/measure_reference.py on this machine (147.6 steps/sec at batch
256).  vs_baseline = our steps/sec / reference steps/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# measured via benchmarks/measure_reference.py (PyTorch CPU, batch 256)
REFERENCE_CPU_STEPS_PER_SEC = 147.6

BATCH = 256
T = 10000  # reference posterior-inference chain length (figure_2.py:171-172)


def main():
    import montecarlopredictivecoding_tpu as mcpc
    from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

    model = mcpc.make_mlp_model(20, 128, 128, 784)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    inputs = jnp.zeros((BATCH, 20))
    latents = model.init_latents(params, inputs, key)
    target = (jax.random.uniform(key, (BATCH, 784)) > 0.5).astype(jnp.float32)

    def run_kernel(seed):
        out, _ = mcpc_chain_pallas(
            params, latents, target, jnp.int32(seed),
            T=T, lr=0.01, noise_var=2.0, loss="bernoulli", packed=True,
        )
        # forced readback: the only reliable sync on the tunneled platform
        return float(out[0][0, 0]), float(out[2][0, 0])

    def make_engine_run():
        from montecarlopredictivecoding_tpu.core.engine import (
            EngineConfig, EngineState, build_train_on_batch,
        )
        from montecarlopredictivecoding_tpu.core.optim import OptimizerSpec
        from montecarlopredictivecoding_tpu.core.schedule import build_plan

        cfg = EngineConfig(
            plan=build_plan(T, update_x_at="all", update_p_at="never"),
            optimizer_x=OptimizerSpec("sgd", lr=0.01),
            optimizer_p=None, langevin_var=2.0,
            loss_fn=mcpc.bernoulli_fn, capture_every_t=False,
        )
        fn = jax.jit(build_train_on_batch(model, cfg))

        def run(seed):
            st = EngineState(
                params=params, latents=latents,
                opt_x_state=cfg.optimizer_x.make().init({"latents": latents}),
                opt_p_state=None, lr_scale=jnp.ones(()),
                key=jax.random.PRNGKey(seed),
            )
            ns, res = fn(st, inputs, {"_target": target})
            return float(res["overall"][-1]), float(ns.latents[0][0, 0])

        return run

    # compile + warm up; fall back to the scan engine if the fused kernel
    # cannot compile on this platform
    run = run_kernel
    try:
        v = run(1)
    except Exception:
        run = make_engine_run()
        v = run(1)
    assert all(x == x for x in v), "non-finite latents"

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        v = run(2 + i)
        times.append(time.perf_counter() - t0)
        assert all(x == x for x in v), "non-finite latents"
    times.sort()
    dt = times[len(times) // 2]

    steps_per_sec = T / dt
    print(
        json.dumps(
            {
                "metric": "Langevin inference steps/sec/chip (MNIST MLP, batch 256, T=10000 chain)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
