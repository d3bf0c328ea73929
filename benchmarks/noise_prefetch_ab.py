"""A/B the software-pipelined Box-Muller (kernel noise_prefetch flag).

The prefetch variant issues the NEXT pair's Box-Muller before the current
pair's steps — same PRNG call sequence, so final latents must match the
default loop BITWISE; only the schedule (and hence time) may differ.  Times
both variants as marginals between two chain lengths at each batch size.

Run on the TPU: python benchmarks/noise_prefetch_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import jax.numpy as jnp
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

DIMS = (20, 128, 128, 784)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(*DIMS)
    params = model.init(key)

    def run(B, T, prefetch, seed):
        latents = model.init_latents(params, jnp.zeros((B, DIMS[0])), key)
        target = (jax.random.uniform(key, (B, DIMS[-1])) > 0.5).astype(
            jnp.float32
        )
        out, _ = mcpc_chain_pallas(
            params, latents, target, jnp.int32(seed), T=T, lr=0.01,
            noise_var=2.0, loss="bernoulli", packed=True,
            noise_prefetch=prefetch,
        )
        return out

    # bitwise equality first (T odd to cover the epilogue draw)
    a = run(256, 31, False, 7)
    b = run(256, 31, True, 7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("prefetch == default bitwise (T=31, B=256): OK", flush=True)

    def marginal(B, prefetch, T_lo=2000, T_hi=10000, reps=5):
        def once(T, seed):
            out = run(B, T, prefetch, seed)
            assert float(out[0][0, 0]) == float(out[0][0, 0])

        once(T_lo, 1), once(T_hi, 1)  # compile
        ts = {T_lo: [], T_hi: []}
        for i in range(reps):
            for T in (T_lo, T_hi):
                t0 = time.perf_counter()
                once(T, 2 + i)
                ts[T].append(time.perf_counter() - t0)
        return (min(ts[T_hi]) - min(ts[T_lo])) / (T_hi - T_lo) * 1e6

    print("| batch | default us/step | prefetch us/step | speedup |")
    print("|---|---|---|---|")
    for B in (256, 1024, 4096):
        d = marginal(B, False)
        p = marginal(B, True)
        print(f"| {B} | {d:.2f} | {p:.2f} | x{d / p:.3f} |", flush=True)


if __name__ == "__main__":
    main()
