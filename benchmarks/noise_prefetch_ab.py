"""A/B the kernel noise-path variants: software-pipelined Box-Muller
(noise_prefetch) and rsqrt-based radius (noise_rsqrt).

prefetch issues the NEXT pair's Box-Muller before the current pair's steps —
it CONSUMES the same PRNG draw sequence, so final latents match the default
loop up to compiler fp-reassociation (bitwise if Mosaic schedules the carry
identically; <=1e-6-scale otherwise — CPU-interpret parity in
tests/test_pallas_noise.py measured <=1e-6 after 20 steps).  rsqrt computes
sqrt(q) as q*rsqrt(max(q, 1e-30)) — a few-ulp identity guarded by a NORMAL
f32 floor (the round-4 additive 1e-38 pad was denormal, hence flushed to
zero by the TPU VPU: every u1=1 draw went 0*rsqrt(0)=NaN on long chains —
the 05:20 UTC 2026-08-19 row failures).  Checked against the default to
1e-4 after a short chain.  Times every variant as a marginal between two
chain lengths at each batch size.

Run on the TPU: python benchmarks/noise_prefetch_ab.py [--batches 256,1024,4096]

Flap-resumable: each batch row prints its own NOISE_AB_ROW_B{B}_DONE
marker and a row failure (e.g. a garbage readback when the tunnel flaps
mid-run — observed 04:47 UTC 2026-08-19 as a NaN right as the backend
probe started failing) only skips that row, so landed rows survive and a
re-run can target the missing batches.
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
VARIANTS = (
    ("default", dict()),
    ("prefetch", dict(noise_prefetch=True)),
    ("rsqrt", dict(noise_rsqrt=True)),
    ("prefetch+rsqrt", dict(noise_prefetch=True, noise_rsqrt=True)),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024,4096")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    assert jax.default_backend() == "tpu", jax.default_backend()
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(*DIMS)
    params = model.init(key)

    def run(B, T, opts, seed):
        latents = model.init_latents(params, jnp.zeros((B, DIMS[0])), key)
        target = (jax.random.uniform(key, (B, DIMS[-1])) > 0.5).astype(
            jnp.float32
        )
        out, _ = mcpc_chain_pallas(
            params, latents, target, jnp.int32(seed), T=T, lr=0.01,
            noise_var=2.0, loss="bernoulli", packed=True, **opts,
        )
        return out

    # correctness first (T odd to cover the epilogue draw)
    ref = run(256, 31, {}, 7)
    pf = run(256, 31, dict(noise_prefetch=True), 7)
    worst = 0.0
    for x, y in zip(ref, pf):
        worst = max(worst, float(np.abs(np.asarray(x) - np.asarray(y)).max()))
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
    print(
        "prefetch == default (T=31, B=256): "
        + ("BITWISE" if worst == 0.0 else f"max |diff| {worst:.2e} (<=1e-5)")
        + " OK",
        flush=True,
    )
    rs = run(256, 31, dict(noise_rsqrt=True), 7)
    for x, y in zip(ref, rs):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)
    print("rsqrt ~= default to 1e-4 (T=31, B=256): OK", flush=True)

    def marginal(B, opts, T_lo=2000, T_hi=10000, reps=5):
        def once(T, seed):
            out = run(B, T, opts, seed)
            v = float(out[0][0, 0])
            if v != v:
                raise ValueError(
                    f"NaN readback at B={B} opts={opts} T={T} — garbage "
                    "from a mid-run tunnel flap, or a real kernel blow-up"
                )

        once(T_lo, 1), once(T_hi, 1)  # compile
        ts = {T_lo: [], T_hi: []}
        for i in range(reps):
            for T in (T_lo, T_hi):
                t0 = time.perf_counter()
                once(T, 2 + i)
                ts[T].append(time.perf_counter() - t0)
        return (min(ts[T_hi]) - min(ts[T_lo])) / (T_hi - T_lo) * 1e6

    print("| batch | " + " | ".join(n for n, _ in VARIANTS) + " |")
    print("|---" * (len(VARIANTS) + 1) + "|")
    ok = True
    for B in batches:
        try:
            row = [f"| {B} "]
            base = None
            for name, opts in VARIANTS:
                m = marginal(B, opts)
                if base is None:
                    base = m
                    row.append(f"| {m:.2f} us ")
                else:
                    row.append(f"| {m:.2f} us (x{base / m:.3f}) ")
            print("".join(row) + "|", flush=True)
            print(f"NOISE_AB_ROW_B{B}_DONE", flush=True)
        except Exception as e:
            ok = False
            print(f"NOISE_AB_ROW_B{B} FAILED: {type(e).__name__}: {e}",
                  flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
    print("NOISE_AB_DONE")
