"""Matmul-layout / precision sweep for the fused chain kernel — informs the
kernel's 'auto' thresholds (matmul_layout, use_pallas_bf16).

Measures the inference chain (T=2000) and the fused train step
(250 warm + 150 chain + MC pgrads) for {B} x {blockdiag, perlayer} x
{f32, bf16} on the real chip.  CAVEAT: timing includes dispatch + one
readback — at T=2000 the ~30 ms fixed tunnel cost leaves ~15 us/step
baked into every row, so use this table for RELATIVE layout/precision
comparisons only; absolute marginals come from kernel_microbench.py
(two-length fits) and bench.py's T=10000 scaling table.

Run: python benchmarks/layout_bench.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import jax.numpy as jnp

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas

# single source of the flagship dims / useful-FLOP accounting / timing stat
from bench import DIMS, USEFUL, _median_time

T_CHAIN = 2000
WARM_T, MIXING, SAMPLING = 250, 50, 100


def median_time(fn, reps=7):
    return _median_time(fn, reps=reps)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    model = mcpc.make_mlp_model(*DIMS)
    key = jax.random.PRNGKey(0)
    params = model.init(key)

    def setup(B):
        latents = model.init_latents(params, jnp.zeros((B, DIMS[0])), key)
        target = (jax.random.uniform(key, (B, DIMS[3])) > 0.5).astype(
            jnp.float32
        )
        return latents, target

    print("| mode | B | layout | prec | time | per-step | useful TFLOP/s |")
    print("|---|---|---|---|---|---|---|")
    for B in (256, 1024):
        latents, target = setup(B)
        for layout in ("blockdiag", "perlayer"):
            for bf16 in (False, True):
                def chain(seed):
                    out, _ = mcpc_chain_pallas(
                        params, latents, target, jnp.int32(seed),
                        T=T_CHAIN, lr=0.01, noise_var=2.0, loss="bernoulli",
                        bf16_matmul=bf16, matmul_layout=layout,
                    )
                    return (float(out[0][0, 0]),)

                chain(1)
                dt = median_time(chain)
                fl = T_CHAIN * 2 * 2.0 * B * USEFUL
                print(
                    f"| chain | {B} | {layout} | {'bf16' if bf16 else 'f32'} "
                    f"| {dt*1e3:.1f} ms | {dt/T_CHAIN*1e6:.2f} us "
                    f"| {fl/dt/1e12:.2f} |"
                )

                def train(seed):
                    _, pg = mcpc_chain_pallas(
                        params, latents, target, jnp.int32(seed),
                        T=MIXING + SAMPLING, lr=0.1, noise_var=2.0,
                        loss="bernoulli", mixing=MIXING, with_pgrads=True,
                        warm_T=WARM_T, warm_lr=0.7, bf16_matmul=bf16,
                        matmul_layout=layout,
                    )
                    return (float(pg[3]["w"][0, 0]),)

                train(1)
                dt = median_time(train)
                steps = WARM_T + MIXING + SAMPLING
                fl = (
                    (steps * 2 + SAMPLING) * 2.0 * B * USEFUL
                )
                print(
                    f"| train | {B} | {layout} | {'bf16' if bf16 else 'f32'} "
                    f"| {dt*1e3:.1f} ms | {dt/steps*1e6:.2f} us "
                    f"| {fl/dt/1e12:.2f} |"
                )


def phase_isolation():
    """Isolate the warm-phase cost: warm-only vs chain-only (noise off/on),
    pgrads on/off — same total steps."""
    assert jax.default_backend() == "tpu"
    model = mcpc.make_mlp_model(*DIMS)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    STEPS = 400
    print("| B | variant | time | per-step |")
    print("|---|---|---|---|")
    for B in (256, 1024):
        latents = model.init_latents(params, jnp.zeros((B, DIMS[0])), key)
        target = (jax.random.uniform(key, (B, DIMS[3])) > 0.5).astype(jnp.float32)
        variants = {
            "chain sgd, no noise": dict(T=STEPS, noise_var=None),
            "chain sgd, noise": dict(T=STEPS, noise_var=2.0),
            "chain sgd, noise+pgrads": dict(T=STEPS, noise_var=2.0,
                                            mixing=STEPS - 100, with_pgrads=True),
            "warm adam only": dict(T=0, noise_var=None, warm_T=STEPS,
                                   warm_lr=0.7),
        }
        for name, kw in variants.items():
            def run(seed, kw=kw):
                out = mcpc_chain_pallas(
                    params, latents, target, jnp.int32(seed),
                    lr=0.1, loss="bernoulli", **kw,
                )
                return (float(out[0][0][0, 0]),)
            run(1)
            dt = median_time(run)
            print(f"| {B} | {name} | {dt*1e3:.1f} ms | {dt/STEPS*1e6:.2f} us |")


if __name__ == "__main__":
    import sys as _s
    if "--phases" in _s.argv:
        phase_isolation()
    else:
        main()
