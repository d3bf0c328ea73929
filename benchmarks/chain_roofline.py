"""Per-step cost budget for the fused Langevin chain (VERDICT r3 weak #3/#4).

Decomposes the chain step at each batch size into its component costs by
differencing kernel variants, each timed as a MARGINAL over two chain
lengths (one dispatch per chain; the T-difference cancels the ~29 ms fixed
tunnel dispatch+readback cost):

    full (noise + loss)        — the headline workload (bench.py)
    noise off                  — full minus the Box-Muller + add
    noise off, loss none       — minus the sensory backward matmul + sigmoid
    (components: noise = full - no_noise; loss = no_noise - bare;
     bare = matmuls + energy grads + x update)

Writes a markdown table to ROOFLINE.md and echoes to stdout.  Run on the
TPU: python benchmarks/chain_roofline.py [--batches 256,1024,4096]
"""

import argparse
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
USEFUL = sum(a * b for a, b in zip(DIMS[:-1], DIMS[1:]))
PEAK_FLOPS = 197e12  # v5e bf16 MXU peak


def _run_chain(params, latents, target, T, *, noise, loss, bf16, reps=5,
               layout="auto"):
    """Median wall time of one whole-chain dispatch (includes dispatch +
    one readback)."""

    def once(seed):
        out, _ = mcpc_chain_pallas(
            params, latents, target if loss != "none" else None,
            jnp.int32(seed), T=T, lr=0.01,
            noise_var=2.0 if noise else None, loss=loss, packed=True,
            bf16_matmul=bf16, matmul_layout=layout,
        )
        v = float(out[0][0, 0])
        assert v == v, "non-finite"

    once(1)  # compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        once(2 + i)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def marginal_us(params, latents, target, *, noise, loss, bf16,
                T_lo=2000, T_hi=10000, layout="auto"):
    """Marginal per-step time (us) between two chain lengths."""
    lo = _run_chain(params, latents, target, T_lo, noise=noise, loss=loss,
                    bf16=bf16, layout=layout)
    hi = _run_chain(params, latents, target, T_hi, noise=noise, loss=loss,
                    bf16=bf16, layout=layout)
    return (hi - lo) / (T_hi - T_lo) * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024,4096")
    ap.add_argument("--reps", type=int, default=5)
    # f32-only by default: each (batch, feature, T) cell is a separate cold
    # Mosaic compile through the tunnel (minutes each); bf16 doubles the
    # count and the chain is VPU-bound anyway (BENCH_DETAIL r3)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    precisions = (False, True) if args.bf16 else (False,)

    assert jax.default_backend() == "tpu", jax.default_backend()
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(*DIMS)
    params = model.init(key)

    lines = []

    def log(s):
        print(s, flush=True)
        lines.append(s)

    log("# ROOFLINE — fused Langevin chain per-step cost budget")
    log("")
    log("Marginal us/step between T=2000 and T=10000 single-dispatch chains")
    log("(cancels the fixed tunnel dispatch cost); median-of-5 per point.")
    log("")
    log("| batch | prec | full | noise | loss | bare (matmul+update) | "
        "useful-MFU(full) | MFU ceiling (bare) |")
    log("|---|---|---|---|---|---|---|---|")
    for B in batches:
        latents = model.init_latents(params, jnp.zeros((B, DIMS[0])), key)
        target = (jax.random.uniform(key, (B, DIMS[-1])) > 0.5).astype(
            jnp.float32
        )
        for bf16 in precisions:
            try:
                print(f"measuring B={B} {'bf16' if bf16 else 'f32'}...", flush=True)
                full = marginal_us(params, latents, target, noise=True,
                                   loss="bernoulli", bf16=bf16)
                no_noise = marginal_us(params, latents, target, noise=False,
                                       loss="bernoulli", bf16=bf16)
                bare = marginal_us(params, latents, target, noise=False,
                                   loss="none", bf16=bf16)
            except Exception as e:
                log(f"| {B} | {'bf16' if bf16 else 'f32'} | failed "
                    f"({type(e).__name__}: {e}) | | | | | |")
                continue
            flops = 2 * 2.0 * B * USEFUL  # per step, fwd+bwd useful matmul
            # with loss='none' the sensory layer (the model's LARGEST
            # matmul, d2*d3 of USEFUL) is dead code and eliminated, so the
            # bare variant's own useful work excludes it
            bare_useful = sum(
                a * b for a, b in zip(DIMS[:-2], DIMS[1:-1])
            )
            mfu_full = flops / (full * 1e-6) / PEAK_FLOPS
            mfu_bare = (
                2 * 2.0 * B * bare_useful / (bare * 1e-6) / PEAK_FLOPS
            )
            log(
                f"| {B} | {'bf16' if bf16 else 'f32'} "
                f"| {full:.2f} us | {full - no_noise:+.2f} us "
                f"| {no_noise - bare:+.2f} us | {bare:.2f} us "
                f"| {mfu_full * 100:.1f}% | {mfu_bare * 100:.1f}% |"
            )
    log("")
    log("Interpretation: 'noise' = Box-Muller + masked add (pure VPU);")
    log("'loss' = the sensory layer's forward + backward matmuls (the")
    log("model's largest, 128x784 — loss='none' eliminates them as dead")
    log("code) plus the sigmoid/BCE gradient; 'bare' = the latent-layer")
    log("matmuls + energy grads + SGD update.  MFU columns divide each")
    log("variant's OWN useful FLOPs (full: all layers; bare: latent")
    log("layers only).")

    with open(os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.md"),
              "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote ROOFLINE.md")


if __name__ == "__main__":
    main()
