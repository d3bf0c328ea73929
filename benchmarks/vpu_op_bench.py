"""Per-op VPU cost probe for the chain kernel's elementwise paths.

The B=256 chain step is ~1.4 us of MXU-bound matmul + ~2.4 us of VPU
transcendentals (Box-Muller noise + Bernoulli sigmoid).  This probe times a
T-step serial loop over a [B, 384] f32 VMEM tile per op variant (marginal
over two T values, min-of-N), to find which transcendental dominates and
whether phase-specialized polynomial sin/cos beats the Mosaic-lowered ones.

Run (TPU): python benchmarks/vpu_op_bench.py [B ...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _min_time
# time the KERNEL'S actual implementations, not private copies — a
# coefficient/reduction change in ops/pallas_mcpc.py is what this bench
# exists to measure (accuracy is pinned by
# tests/test_pallas.py::test_sincos_2pi_accuracy)
from montecarlopredictivecoding_tpu.ops.pallas_mcpc import (
    _sincos_2pi as _sincos_poly,
    _uniforms,
)

# long loops: per-variant work must dwarf the ~29 ms dispatch noise, or the
# marginal fit returns garbage (observed: negative per-step costs at T=10k)
T_LO, T_HI = 100_000, 500_000
COLS = 384


def _bits(shape):
    """One exponent-bitcast uniform in [1, 2) (the kernel draws these in
    pairs via _uniforms; single-draw variant for the per-op probes)."""
    return pltpu.bitcast(
        (pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 9)
        | jnp.uint32(0x3F800000),
        jnp.float32,
    )


def make_variant(name):
    def body_fn(t, x, shape):
        if name == "baseline":
            return x * 0.9999 + 1e-4
        if name == "prng":
            return x * 0.9999 + 1e-6 * _bits(shape)
        if name == "log":
            return x * 0.1 + jnp.log(jnp.abs(x) + 1.0)
        if name == "sqrt":
            return x * 0.1 + jnp.sqrt(jnp.abs(x) + 1.0)
        if name == "rsqrt":
            return x * 0.1 + jax.lax.rsqrt(jnp.abs(x) + 1.0)
        if name == "sqrt_via_rsqrt":
            v = jnp.abs(x) + 1.0
            return x * 0.1 + v * jax.lax.rsqrt(v)
        if name == "sin":
            return x * 0.1 + jnp.sin(x)
        if name == "cos":
            return x * 0.1 + jnp.cos(x)
        if name == "exp":
            return x * 0.1 + jnp.exp(-jnp.abs(x))
        if name == "sigmoid":
            return x * 0.1 + jax.nn.sigmoid(x)
        if name == "tanh":
            return x * 0.1 + jnp.tanh(x)
        if name == "sigmoid_tanh":
            return x * 0.1 + (0.5 + 0.5 * jnp.tanh(0.5 * x))
        if name == "bm_hw":
            u1, u2 = _uniforms(shape)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            th = (2.0 * np.pi) * u2
            return x * 0.9999 + 1e-6 * (r * jnp.cos(th) + r * jnp.sin(th))
        if name == "bm_poly":
            u1, u2 = _uniforms(shape)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            c, s = _sincos_poly(u2)
            return x * 0.9999 + 1e-6 * (r * c + r * s)
        raise ValueError(name)

    return body_fn


def run_variant(name, B, T, seed):
    body_fn = make_variant(name)

    def kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        shape = x_ref.shape

        def step(t, _):
            o_ref[...] = body_fn(t, o_ref[...], shape)
            return ()

        o_ref[...] = x_ref[...]
        jax.lax.fori_loop(0, T, step, ())

    x = jnp.full((B, COLS), 0.3, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, COLS), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([seed], jnp.int32), x)
    return (float(out[0, 0]),)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256]
    # numeric check of the poly on CPU-side jnp first
    u = jnp.linspace(0.0, 0.999999, 40001)
    c, s = _sincos_poly(u)
    ce = float(jnp.max(jnp.abs(c - jnp.cos(2 * np.pi * u))))
    se = float(jnp.max(jnp.abs(s - jnp.sin(2 * np.pi * u))))
    print(f"poly max abs err: cos {ce:.2e}, sin {se:.2e}")

    for B in batches:
        print(f"== B={B} [B,{COLS}] f32, marginal us/step (T={T_LO} vs {T_HI}) ==")
        base = None
        for name in ("baseline", "prng", "log", "sqrt", "rsqrt",
                     "sqrt_via_rsqrt", "sin", "cos", "exp",
                     "sigmoid", "tanh", "sigmoid_tanh", "bm_hw", "bm_poly"):
            try:
                run_variant(name, B, T_LO, 0), run_variant(name, B, T_HI, 1)
                lo = _min_time(functools.partial(run_variant, name, B, T_LO))
                hi = _min_time(functools.partial(run_variant, name, B, T_HI))
                us = (hi - lo) / (T_HI - T_LO) * 1e6
            except Exception as e:
                print(f"  {name:13s}: failed ({type(e).__name__}: {e})")
                continue
            if name == "baseline":
                base = us
            extra = f" (+{us - base:.3f})" if base is not None and name != "baseline" else ""
            print(f"  {name:13s}: {us:7.3f} us/step{extra}")


if __name__ == "__main__":
    main()
