"""CPU tests for the kernel NOISE path (interpret mode).

The TPU on-core PRNG has no CPU lowering, so the noise path historically ran
only on hardware — leaving the ``noise_prefetch``/``noise_rsqrt`` kernel
scheduling variants referenced by zero tests (VERDICT r4).  ``interpret=True``
kernels now substitute a deterministic draw-indexed counter generator
(``ops.pallas_mcpc._mock_bits``), which makes three things checkable off-TPU:

1. scheduling-variant parity — variants that CONSUME the same (seed, draw)
   sequence must be bitwise-identical (prefetch) / few-ulp equal (rsqrt);
2. the Langevin stationary noise law N(b, 1/(1 - lr/2)) end-to-end through
   the packed kernel (mirrors benchmarks/kernel_sanity.py leg 9 on CPU);
3. per-tile stream decorrelation (mirrors kernel_sanity leg 2).

The mock is NOT the hardware stream: hardware-vs-hardware equality stays in
benchmarks/noise_prefetch_ab.py / kernel_sanity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas
from montecarlopredictivecoding_tpu.ops.pallas_mcpc import (
    _BM_RSQRT_FLOOR,
    _mock_bits,
    _normals,
    _uniforms,
)


# ---------------------------------------------------------------- generator


def test_mock_bits_deterministic_and_distinct():
    shape = (8, 128)
    a = np.asarray(_mock_bits(shape, jnp.int32(3), jnp.int32(7)))
    b = np.asarray(_mock_bits(shape, jnp.int32(3), jnp.int32(7)))
    assert (a == b).all()  # pure function of (seed, draw, index)
    assert (a != np.asarray(_mock_bits(shape, jnp.int32(3), jnp.int32(8)))).any()
    assert (a != np.asarray(_mock_bits(shape, jnp.int32(4), jnp.int32(7)))).any()
    # per-element distinctness (no lane/sublane repetition)
    assert np.unique(a).size > 0.99 * a.size


def test_mock_uniform_statistics():
    u1, u2 = _uniforms((128, 256), mock=(jnp.int32(11), jnp.int32(0)))
    u1, u2 = np.asarray(u1), np.asarray(u2)
    assert (u1 > 0).all() and (u1 <= 1).all()  # safe for log
    assert (u2 >= 0).all() and (u2 < 1).all()
    for u in (u1, u2):
        assert abs(u.mean() - 0.5) < 0.01, u.mean()
        assert abs(u.var() - 1 / 12) < 0.05 / 12, u.var()


def test_mock_normal_moments():
    z = np.asarray(_normals((256, 256), mock=(jnp.int32(1), jnp.int32(0))))
    assert abs(z.mean()) < 0.02, z.mean()
    assert abs(z.var() - 1.0) < 0.03, z.var()
    # Box-Muller tail truncation caps |z| at ~5.65 sigma (module docstring)
    assert np.abs(z).max() < 5.7


# ------------------------------------------------------- kernel-level setup


@pytest.fixture(scope="module")
def mlp_setup():
    model = mcpc.make_mlp_model(4, 8, 8, 16)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    B = 8
    latents = model.init_latents(params, jnp.zeros((B, 4)), key)
    target = (jax.random.uniform(key, (B, 16)) > 0.5).astype(jnp.float32)
    return model, params, latents, target


@pytest.fixture(scope="module")
def output_pc_setup():
    model = mcpc.make_mlp_model(4, 8, 8, 16, output_pc=mcpc.PC())
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    latents = model.init_latents(params, jnp.zeros((8, 4)), key)
    return model, params, latents


def _run(params, latents, target, **kw):
    out = mcpc_chain_pallas(
        params, latents, target, jnp.int32(5), lr=0.02, noise_var=2.0,
        interpret=True, **kw,
    )
    return jax.tree_util.tree_map(np.asarray, out)


# ------------------------------------------------- scheduling-variant parity


@pytest.mark.parametrize("T", [20, 21])
def test_noise_prefetch_parity(mlp_setup, T):
    """The software-pipelined Box-Muller consumes the identical (seed, draw)
    sequence, so outputs agree to fp-reassociation rounding only (the carry
    materializes values the inline loop lets XLA fuse/FMA-contract; measured
    <=1e-6 after 20 steps, exact for T<=3 where the loop unrolls).  A single
    misindexed draw would shift latents by ~noise_std*O(1) ~ 0.1 — four
    orders above the tolerance (see the sensitivity companion below).
    Even T (discarded trailing carry) and odd T (epilogue pair) both."""
    _, params, latents, target = mlp_setup
    kw = dict(T=T, mixing=4, loss="bernoulli", with_pgrads=True,
              return_scalars=True)
    base = _run(params, latents, target, **kw)
    pf = _run(params, latents, target, noise_prefetch=True, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(pf)):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-5)


def test_noise_parity_tolerance_is_sensitive(mlp_setup):
    """Companion to the parity tests: a genuinely different noise stream
    (seed+1) moves the latents far beyond the parity tolerance, so the
    allclose bounds above would catch a draw-indexing bug."""
    _, params, latents, target = mlp_setup
    kw = dict(T=20, lr=0.02, noise_var=2.0, loss="bernoulli", interpret=True)
    a, _ = mcpc_chain_pallas(params, latents, target, jnp.int32(5), **kw)
    b, _ = mcpc_chain_pallas(params, latents, target, jnp.int32(6), **kw)
    assert max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(a, b)
    ) > 1e-2


def test_noise_prefetch_rsqrt_combo_parity(mlp_setup):
    """The combined variant (both flags, the 4th cell of the hardware A/B)
    stays within the rsqrt tolerance of the default loop."""
    _, params, latents, target = mlp_setup
    kw = dict(T=21, mixing=4, loss="bernoulli", with_pgrads=True,
              return_scalars=True)
    base = _run(params, latents, target, **kw)
    combo = _run(params, latents, target, noise_prefetch=True,
                 noise_rsqrt=True, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(combo)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("T", [20, 21])
def test_noise_prefetch_parity_output_pc(output_pc_setup, T):
    """Same parity through the trailing-PC joint sampler (4 noise draws per
    pair: the x3 stream offsets must line up too)."""
    _, params, latents = output_pc_setup
    kw = dict(T=T, loss="none", output_var=0.5, return_scalars=True)
    base = _run(params, latents, None, **kw)
    pf = _run(params, latents, None, noise_prefetch=True, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(pf)):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-5)


@pytest.mark.parametrize("T", [20, 21])
def test_noise_rsqrt_radius_identity(mlp_setup, T):
    """sqrt(q) = q*rsqrt(q) is exact in reals; in f32 the difference is a
    few ulp on the Box-Muller radius — after a T-step contractive chain the
    outputs must agree to ~1e-5."""
    _, params, latents, target = mlp_setup
    kw = dict(T=T, mixing=4, loss="bernoulli", with_pgrads=True,
              return_scalars=True)
    base = _run(params, latents, target, **kw)
    rs = _run(params, latents, target, noise_rsqrt=True, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(base),
                    jax.tree_util.tree_leaves(rs)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_rsqrt_floor_survives_denormal_flush():
    """Regression for the round-5 hardware NaN: the rsqrt radius guard must
    be a max() against a NORMAL f32 — the TPU VPU flushes denormals to zero,
    so the round-4 additive 1e-38 pad (subnormal: below f32 min-normal)
    vanished on hardware and every u1=1 draw (q=0, p=2^-23) went
    0*rsqrt(0) = NaN on long wide-batch chains.  CPU honors denormals, which
    is why the kernel parity tests alone could not catch it; this pins the
    two properties the guard needs on hardware."""
    tiny = np.finfo(np.float32).tiny  # smallest NORMAL f32
    # 1. the floor survives flush-to-zero (is a normal f32)
    assert np.float32(_BM_RSQRT_FLOOR) >= tiny
    # 2. exactness: the floor never perturbs a representable nonzero q.
    #    u1 ranges over {k*2^-23, k=1..2^23}; the largest u1 below 1 gives
    #    the smallest nonzero q = -2*ln(1 - 2^-23) ~ 2.4e-7.
    q_min = np.float32(-2.0 * np.log1p(-(2.0 ** -23)))
    assert np.float32(_BM_RSQRT_FLOOR) < q_min
    # 3. the guarded identity at the endpoints and across the q range,
    #    exactly as the kernel computes it (f32 lax ops)
    q = jnp.asarray(
        [0.0, float(q_min), 1e-3, 1.0, -2.0 * np.log(2.0 ** -23)],
        jnp.float32,
    )
    r = q * jax.lax.rsqrt(jnp.maximum(q, _BM_RSQRT_FLOOR))
    r = np.asarray(r)
    assert np.isfinite(r).all()
    assert r[0] == 0.0  # the q=0 draw maps to 0, the sqrt value
    np.testing.assert_allclose(r, np.sqrt(np.asarray(q)), rtol=3e-7)


# ----------------------------------------------------------- semantics legs


def test_noise_law_packed_kernel():
    """kernel_sanity leg 9 on CPU: with zero weights every PC site's energy
    is 0.5*(x - b)^2, so the ULA chain's stationary law is
    N(b, 1/(1 - lr/2)).  Catches broken Box-Muller pairing, draw-index
    collisions, or pad-lane leakage through the whole packed kernel."""
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(20, 64, 64, 128)
    params = model.init(key)
    params = tuple(
        {"w": jnp.zeros_like(p["w"]), "b": p["b"]} for p in params
    )
    B, T, lr = 256, 400, 0.05
    latents = model.init_latents(params, jnp.zeros((B, 20)), key)
    lat, _ = mcpc_chain_pallas(
        params, latents, None, jnp.int32(11), T=T, lr=lr, noise_var=2.0,
        loss="none", interpret=True,
    )
    exp_var = 1.0 / (1.0 - lr / 2.0)
    for i, x in enumerate(lat):
        b = np.asarray(params[i]["b"])
        d = np.asarray(x) - b[None, :]
        n = d.size
        # var-estimator std err = exp_var * sqrt(2/n); allow 4 sigma
        tol = 4.0 * np.sqrt(2.0 / n)
        assert abs(float(d.mean())) < 4.0 * np.sqrt(exp_var / n) + 0.01, (
            i, d.mean())
        assert abs(float(d.var()) - exp_var) < tol * exp_var + 0.01, (
            i, d.var(), exp_var)


def test_tile_stream_decorrelation():
    """kernel_sanity leg 2 on CPU: two batch tiles starting from IDENTICAL
    latents must end different — per-tile seeds decorrelate the mock streams
    exactly as prng_seed(seed + tile_i) does on hardware."""
    key = jax.random.PRNGKey(0)
    model = mcpc.make_mlp_model(4, 8, 8, 16)
    params = model.init(key)
    latents = model.init_latents(params, jnp.zeros((8, 4)), key)
    latents = tuple(jnp.tile(x[:4], (4, 1)) for x in latents)  # 4 equal rows
    target = jnp.tile(
        (jax.random.uniform(key, (4, 16)) > 0.5).astype(jnp.float32), (4, 1)
    )
    lat, _ = mcpc_chain_pallas(
        params, latents, target, jnp.int32(2), T=16, lr=0.02, noise_var=2.0,
        loss="bernoulli", batch_tile=8, interpret=True,
    )
    a = np.asarray(lat[1])
    # rows within one tile share a stream index layout but differ by row
    # index; across the tile boundary the seed differs
    assert not np.allclose(a[:4], a[8:12])
    # determinism: same call, same result
    lat2, _ = mcpc_chain_pallas(
        params, latents, target, jnp.int32(2), T=16, lr=0.02, noise_var=2.0,
        loss="bernoulli", batch_tile=8, interpret=True,
    )
    assert (np.asarray(lat2[1]) == a).all()


def test_unpacked_kernel_noise_runs_on_cpu(mlp_setup):
    """The unpacked baseline kernel's noise path also rides the mock (draws
    indexed per step): finite outputs, actually stochastic."""
    _, params, latents, target = mlp_setup
    lat, _ = mcpc_chain_pallas(
        params, latents, target, jnp.int32(1), T=10, lr=0.02, noise_var=2.0,
        loss="bernoulli", packed=False, interpret=True,
    )
    det, _ = mcpc_chain_pallas(
        params, latents, target, jnp.int32(1), T=10, lr=0.02, noise_var=None,
        loss="bernoulli", packed=False, interpret=True,
    )
    for a, b in zip(lat, det):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        assert not np.allclose(a, b)
