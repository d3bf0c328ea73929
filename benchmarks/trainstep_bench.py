"""Fused train-step throughput, tunnel-latency-free.

One tunneled dispatch costs ~29 ms regardless of work, which dominates a
single train step (~5 ms of compute) and made the naive per-dispatch MFU
numbers meaningless.  This bench scans the full train step (Adam warm 250 +
chain 150 + MC pgrads + Adam p-update) over K stacked batches in ONE
dispatch — exactly experiments/train_mnist.py's pipeline — and fits the
marginal per-batch time from two K values.

Run: python benchmarks/trainstep_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import jax.numpy as jnp
import optax

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

from bench import DIMS, USEFUL  # single source of the flagship dims / useful-FLOP accounting

WARM_T, MIXING, SAMPLING = 250, 50, 100
K_LO, K_HI = 2, 26


def main():
    assert jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(*DIMS)
    params0 = model.init(key)
    opt_p = optax.adam(0.01)

    print("| B | prec | marginal ms/batch | images/s | us/step | useful TFLOP/s | MFU(bf16 peak) |")
    print("|---|---|---|---|---|---|---|")
    for B, bf16 in ((256, False), (256, True), (1024, False), (1024, True), (4096, False)):
        data = (jax.random.uniform(key, (K_HI, B, DIMS[3])) > 0.5).astype(
            jnp.float32
        )

        def make(k):
            @jax.jit
            def run_chunk(params, opt_state, key, data_k):
                def body(carry, d):
                    params, opt_state, key = carry
                    key, k_lat, k_seed = jax.random.split(key, 3)
                    pseudo = jnp.zeros((B, DIMS[0]))
                    latents = model.init_latents(params, pseudo, k_lat)
                    seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
                    _, pg = mcpc_chain_pallas(
                        params, latents, d, seed,
                        T=MIXING + SAMPLING, lr=0.1, noise_var=2.0,
                        loss="bernoulli", mixing=MIXING, with_pgrads=True,
                        warm_T=WARM_T, warm_lr=0.7, bf16_matmul=bf16,
                    )
                    g = jax.tree_util.tree_map(
                        lambda x: x / (SAMPLING * B), pg
                    )
                    updates, opt_state = opt_p.update(g, opt_state, params)
                    return (optax.apply_updates(params, updates), opt_state, key), None

                (params, opt_state, key), _ = jax.lax.scan(
                    body, (params, opt_state, key), data_k
                )
                return params, opt_state, key

            def run(seed):
                p, s, _ = run_chunk(
                    params0, opt_p.init(params0), jax.random.PRNGKey(seed),
                    data[:k],
                )
                float(p[3]["w"][0, 0])

            return run

        def med(run, reps=9):
            # min-of-N: the tunnel's per-dispatch latency noise is heavy and
            # positive; a marginal fit of medians can even go negative
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                run(2 + i)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        lo_run, hi_run = make(K_LO), make(K_HI)
        lo_run(0), hi_run(1)
        lo, hi = med(lo_run), med(hi_run)
        per_batch = (hi - lo) / (K_HI - K_LO)
        steps = WARM_T + MIXING + SAMPLING
        fl = (steps * 2 + SAMPLING) * 2.0 * B * USEFUL
        print(
            f"| {B} | {'bf16' if bf16 else 'f32'} | {per_batch*1e3:.2f} "
            f"| {B/per_batch:,.0f} | {per_batch/steps*1e6:.2f} "
            f"| {fl/per_batch/1e12:.2f} | {fl/per_batch/197e12*100:.1f}% |"
        )


if __name__ == "__main__":
    main()
