"""Micro-benchmark of the fused chain kernel's per-step cost structure.

Fits the MARGINAL cost per step from two chain lengths (cancelling the fixed
~29 ms tunnel dispatch+readback overhead), across feature toggles:

  full      — noise + bernoulli loss + pgrads (training step shape)
  inference — noise + loss, no pgrads (the headline chain)
  no-noise  — loss only (isolates the Box-Muller PRNG cost)
  no-loss   — noise only, unclamped (isolates the sigmoid/BCE branch)
  bare      — neither (pure predict->grad->update serial dependency)

Run: python benchmarks/kernel_microbench.py [batch ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import jax.numpy as jnp

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

# min-of-N marginal statistic shared with bench.py (heavy positive tunnel
# latency noise; a marginal fit of medians can even go negative)
from bench import DIMS, _min_time

T_LO, T_HI = 2000, 10000


def marginal_us(run, reps=7):
    run(T_LO, 0), run(T_HI, 1)  # compile both
    lo = _min_time(lambda s: (run(T_LO, s),), reps=reps)
    hi = _min_time(lambda s: (run(T_HI, s),), reps=reps)
    return (hi - lo) / (T_HI - T_LO) * 1e6, lo, hi


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256, 1024]
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(*DIMS)
    params = model.init(key)

    for B in batches:
        latents = model.init_latents(params, jnp.zeros((B, DIMS[0])), key)
        target = (jax.random.uniform(key, (B, DIMS[-1])) > 0.5).astype(
            jnp.float32
        )

        variants = {
            "full": dict(noise_var=2.0, loss="bernoulli", with_pgrads=True, mixing=0),
            "inference": dict(noise_var=2.0, loss="bernoulli"),
            "no-noise": dict(noise_var=None, loss="bernoulli"),
            "no-loss": dict(noise_var=2.0, loss="none"),
            "bare": dict(noise_var=None, loss="none"),
            "inference-bf16": dict(noise_var=2.0, loss="bernoulli", bf16_matmul=True),
        }
        print(f"== batch {B} (marginal us/step from T={T_LO} vs {T_HI}) ==")
        for name, kw in variants.items():
            def run(T, seed, kw=kw):
                out = mcpc_chain_pallas(
                    params, latents, target, jnp.int32(seed),
                    T=T, lr=0.01, **kw,
                )
                return float(out[0][0][0, 0])

            try:
                us, lo, hi = marginal_us(run)
                print(f"  {name:15s}: {us:7.3f} us/step   "
                      f"(T={T_LO}: {lo * 1e3:7.1f} ms, T={T_HI}: {hi * 1e3:7.1f} ms)")
            except Exception as e:
                print(f"  {name:15s}: failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
