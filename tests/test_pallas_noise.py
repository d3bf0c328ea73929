"""CPU tests for the kernel NOISE path (interpret mode).

The TPU on-core PRNG has no CPU lowering, so the noise path historically ran
only on hardware.  ``interpret=True`` kernels substitute a deterministic
draw-indexed counter generator (``ops.pallas_mcpc._mock_bits``), which makes
the path checkable off-TPU:

1. the Langevin stationary noise law N(b, 1/(1 - lr/2)) end-to-end through
   the packed kernel (mirrors benchmarks/kernel_sanity.py leg 9 on CPU);
2. per-tile stream decorrelation (mirrors kernel_sanity leg 2);
3. generator statistics and draw-index determinism.

The mock is NOT the hardware stream: hardware noise-law equality stays in
benchmarks/kernel_sanity.py.  Two alternative noise schedulings
(``noise_prefetch``/``noise_rsqrt``) were validated through these tests and
then DELETED after the round-5 hardware A/B showed the plain loop faster at
every batch (hw_transcripts/r5/r5_prefetch_fixed.log; EVAL_r5.md item 5) —
along the way the A/B exposed that the TPU VPU flushes f32 denormals, so
guard constants below ~1.18e-38 silently vanish on hardware (commit 8592f17).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas
from montecarlopredictivecoding_tpu.ops.pallas_mcpc import (
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


# ------------------------------------------------------ stream determinism


def test_noise_stream_seed_sensitivity(mlp_setup):
    """A genuinely different noise stream (seed+1) moves the latents by
    O(noise_std) — so the determinism checks in this file (same call, same
    result) and the engine/kernel parity suites would catch a draw-indexing
    bug, whose signature is exactly a shifted stream."""
    _, params, latents, target = mlp_setup
    kw = dict(T=20, lr=0.02, noise_var=2.0, loss="bernoulli", interpret=True)
    a, _ = mcpc_chain_pallas(params, latents, target, jnp.int32(5), **kw)
    b, _ = mcpc_chain_pallas(params, latents, target, jnp.int32(6), **kw)
    assert max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(a, b)
    ) > 1e-2


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
