"""Benchmark: MCPC Langevin inference steps/sec/chip on the MNIST MLP.

Workload (the reference's posterior-inference hot loop, figure_2.py:167-173
scale): generative MLP 20-128-128-784, batch 256 chains, Bernoulli sensory
loss, plain-SGD Langevin chain (grad step + N(0, 2*lr) noise) — identical
math to /root/reference's `random_step` MCPC loop.

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
T = 2000


def main():
    import montecarlopredictivecoding_tpu as mcpc
    from montecarlopredictivecoding_tpu.core.engine import (
        EngineConfig,
        EngineState,
        build_train_on_batch,
    )
    from montecarlopredictivecoding_tpu.core.optim import OptimizerSpec
    from montecarlopredictivecoding_tpu.core.schedule import build_plan

    model = mcpc.make_mlp_model(20, 128, 128, 784)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    inputs = jnp.zeros((BATCH, 20))
    latents = model.init_latents(params, inputs, key)
    target = (jax.random.uniform(key, (BATCH, 784)) > 0.5).astype(jnp.float32)

    cfg = EngineConfig(
        plan=build_plan(T, update_x_at="all", update_p_at="never"),
        optimizer_x=OptimizerSpec("sgd", lr=0.01),
        optimizer_p=None,
        langevin_var=2.0,
        loss_fn=mcpc.bernoulli_fn,
        capture_every_t=False,
    )
    fn = jax.jit(build_train_on_batch(model, cfg))

    def make_state(k):
        opt_x = cfg.optimizer_x.make().init({"latents": latents})
        return EngineState(
            params=params,
            latents=latents,
            opt_x_state=opt_x,
            opt_p_state=None,
            lr_scale=jnp.ones(()),
            key=k,
        )

    # compile + warm up (two runs: the first pays compile, the second clears
    # any lazy-allocation effects); forced float() readbacks are the only
    # reliable sync on the tunneled platform.
    for k in (1, 2):
        state, res = fn(
            make_state(jax.random.PRNGKey(k)), inputs, {"_target": target}
        )
        _ = float(res["overall"][-1])

    reps = 5
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        state, res = fn(
            make_state(jax.random.PRNGKey(3 + i)), inputs, {"_target": target}
        )
        _ = float(res["overall"][-1]) + float(state.latents[0][0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]  # median rep

    steps_per_sec = T / dt
    print(
        json.dumps(
            {
                "metric": "Langevin inference steps/sec/chip (MNIST MLP, batch 256)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
