"""Hardware sanity for the round-2 kernel features — real Mosaic compiles
(no interpret mode): tanh activation, batch grid-tiling, scalar emission,
warm-phase pgrads, trajectory capture with tiling.  Run on the TPU before
long jobs depend on these paths.

Run: python benchmarks/kernel_sanity.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import jax.numpy as jnp
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    key = jax.random.PRNGKey(0)

    def setup(activation="relu", B=64, dims=(20, 128, 128, 784)):
        model = mcpc.make_mlp_model(*dims, activation=activation)
        params = model.init(key)
        latents = model.init_latents(params, jnp.zeros((B, dims[0])), key)
        target = (jax.random.uniform(key, (B, dims[-1])) > 0.5).astype(
            jnp.float32
        )
        return params, latents, target

    # 1) tanh chain + pgrads + scalars
    params, latents, target = setup("tanh")
    lat, pg, scal = mcpc_chain_pallas(
        params, latents, target, jnp.int32(1), T=50, lr=0.02, noise_var=2.0,
        loss="bernoulli", mixing=10, with_pgrads=True, activation="tanh",
        return_scalars=True,
    )
    assert np.isfinite(float(scal["loss"][-1])), scal
    assert np.isfinite(float(pg[3]["w"][0, 0]))
    print("tanh chain + scalars OK:", float(scal["loss"][-1]))

    # 2) batch tiling (B=2048 -> 2 tiles of 1024) + capture + scalars.
    # The two tile-halves start from IDENTICAL latents and targets, so any
    # difference after the noisy chain can only come from per-tile PRNG
    # decorrelation (rows would be bitwise-equal if tiles reused a stream).
    params, latents, target = setup("relu", B=2048)
    latents = tuple(jnp.tile(x[:1024], (2, 1)) for x in latents)
    target = jnp.tile(target[:1024], (2, 1))
    lat, pg, traj, scal = mcpc_chain_pallas(
        params, latents, target, jnp.int32(2), T=30, lr=0.02, noise_var=2.0,
        loss="bernoulli", mixing=10, with_pgrads=True, capture_stride=10,
        return_scalars=True,
    )
    assert traj.shape == (3, 2048, 384), traj.shape  # aligned packed layout
    assert np.isfinite(np.asarray(traj).sum())
    # the two tiles must hold DIFFERENT noise streams
    assert not np.allclose(np.asarray(lat[1][:4]), np.asarray(lat[1][1024:1028]))
    print("batch tiling + capture OK:", traj.shape, float(scal["energy"][-1]))

    # 3) warm-phase pgrads (one-dispatch PC training step) + tiled noise-free
    params, latents, target = setup("relu", B=256)
    lat, pg, scal = mcpc_chain_pallas(
        params, latents, target, jnp.int32(3), T=0, lr=0.1, noise_var=None,
        loss="bernoulli", with_pgrads=True, warm_T=50, warm_lr=0.1,
        warm_pgrads=True, return_scalars=True,
    )
    assert np.isfinite(float(pg[3]["w"][0, 0]))
    print("warm pgrads OK:", float(scal["overall"][-1]) if "overall" in scal
          else float(scal["loss"][-1] + scal["energy"][-1]))

    # 4) bf16 matmuls
    params, latents, target = setup("relu", B=1024)
    lat, _ = mcpc_chain_pallas(
        params, latents, target, jnp.int32(4), T=30, lr=0.02, noise_var=2.0,
        loss="bernoulli", bf16_matmul=True,
    )
    assert np.isfinite(float(lat[0][0, 0]))
    print("bf16 OK")

    # 5) chunked fused training dispatch (lax.scan over the kernel + Adam
    # p-update) — the train_mnist fast path; noise on, so TPU-only
    from montecarlopredictivecoding_tpu.experiments.train_mnist import (
        train_mcpc,
    )

    gen = train_mcpc(
        epochs=1, out="/tmp/kernel_sanity_train", seed=0,
        batches_per_epoch=18, fused=True, log=False,
    )
    w = np.asarray(gen.params[3]["w"])
    assert np.isfinite(w).all()
    print("chunked fused training OK:", float(np.abs(w).max()))

    # 6) masked sensory losses (figure-2 masked posteriors / get_mse_rec):
    # Langevin chain and Adam MAP descent
    params, latents, target = setup("relu", B=256)
    lat, _ = mcpc_chain_pallas(
        params, latents, target, jnp.int32(6), T=30, lr=0.02, noise_var=2.0,
        loss="bernoulli_mask", mask_perc=0.5,
    )
    assert np.isfinite(float(lat[0][0, 0]))
    lat, _ = mcpc_chain_pallas(
        params, latents, target, jnp.int32(7), T=0, lr=0.1, noise_var=None,
        loss="gaussian_mask", mask_perc=0.5, input_var=0.3,
        warm_T=30, warm_lr=0.1,
    )
    assert np.isfinite(float(lat[0][0, 0]))
    print("masked losses OK")

    # 7) per-layer matmul layout == blockdiag on hardware (deterministic)
    params, latents, target = setup("relu", B=1024)
    outs = {}
    for layout in ("blockdiag", "perlayer"):
        outs[layout] = mcpc_chain_pallas(
            params, latents, target, jnp.int32(8), T=30, lr=0.02,
            noise_var=None, loss="bernoulli", mixing=10, with_pgrads=True,
            warm_T=20, warm_lr=0.1, matmul_layout=layout,
        )
    for a, b in zip(outs["blockdiag"][0], outs["perlayer"][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(outs["blockdiag"][1][3]["w"]),
        np.asarray(outs["perlayer"][1][3]["w"]), rtol=5e-4, atol=5e-3,
    )
    print("perlayer == blockdiag OK")

    # 8) output-PC joint sampler: warm + noisy capture chain (figure-3 path)
    model = mcpc.make_mlp_model(
        20, 128, 128, 784,
        output_pc=mcpc.PC(
            energy_fn=mcpc.scaled_gaussian_energy(0.3),
            sample_x_fn=mcpc.sample_x_fn,
        ),
    )
    params = model.init(key)
    latents = model.init_latents(params, jnp.zeros((64, 20)), key)
    lat, _, traj, traj3, scal, warm_mv = mcpc_chain_pallas(
        params, latents, None, jnp.int32(9), T=40, lr=0.02, noise_var=2.0,
        loss="none", output_var=0.3, warm_T=30, warm_lr=0.1,
        capture_stride=10, return_scalars=True, emit_warm_opt_state=True,
    )
    assert traj3.shape == (4, 64, 896), traj3.shape
    assert len(warm_mv) == 4
    assert len(lat) == 4 and np.isfinite(float(lat[3][0, 0]))
    assert np.isfinite(float(scal["energy"][-1]))
    print("output-PC warm + capture OK:", float(scal["energy"][-1]))

    # 9) Langevin noise law on hardware: with zero weights every PC site's
    # energy is 0.5*(x_l - b_l)^2, so the chain's stationary law is
    # N(b_l, 1/(1 - lr/2)) (ULA discretization bias included). Catches a
    # broken PRNG/Box-Muller pairing or pad-lane leakage.
    model = mcpc.make_mlp_model(20, 128, 128, 784)
    params = model.init(key)
    params = tuple(
        {"w": jnp.zeros_like(p["w"]), "b": p["b"]} for p in params
    )
    B, T9, lr9 = 512, 3000, 0.02
    latents = model.init_latents(params, jnp.zeros((B, 20)), key)
    lat, _ = mcpc_chain_pallas(
        params, latents, None, jnp.int32(11), T=T9, lr=lr9, noise_var=2.0,
        loss="none",
    )
    exp_var = 1.0 / (1.0 - lr9 / 2.0)
    for i, x in enumerate(lat):
        b = np.asarray(params[i]["b"])
        d = np.asarray(x) - b[None, :]
        m, v = float(d.mean()), float(d.var())
        assert abs(m) < 0.05, (i, m)
        assert abs(v - exp_var) < 0.05 * exp_var, (i, v, exp_var)
    print(f"noise law OK: var={v:.4f} (expected {exp_var:.4f})")

    # 10) in-kernel per-step scalars (scalar_stride, the every_t default
    # config): the dynamic-sublane slot writes must codegen, rows must be
    # finite, and the final-step slot must equal the final-only mode's row
    # bit-for-bit on the same deterministic chain (shared slot math across
    # the 64-pair lane packing and the grid-tiled accumulation)
    params, latents, target = setup("relu", B=256)
    common = dict(T=70, lr=0.02, noise_var=None, loss="bernoulli")
    _, _, s_steps = mcpc_chain_pallas(
        params, latents, target, jnp.int32(12), return_scalars=True,
        scalar_stride=1, **common,
    )
    _, _, s_final = mcpc_chain_pallas(
        params, latents, target, jnp.int32(12), return_scalars=True,
        **common,
    )
    assert s_steps["loss"].shape == (71,), s_steps["loss"].shape
    assert np.isfinite(np.asarray(s_steps["loss"])).all()
    np.testing.assert_array_equal(
        np.asarray(s_steps["loss"][-1]), np.asarray(s_final["loss"][-1])
    )
    np.testing.assert_array_equal(
        np.asarray(s_steps["energy"][-1]), np.asarray(s_final["energy"][-1])
    )
    # monotone-ish MAP descent: the per-step curve must actually move
    assert float(s_steps["loss"][-1]) < float(s_steps["loss"][0])
    print("per-step scalars OK:", float(s_steps["loss"][-1]))

    # 11) dp-fused shard noise (VERDICT r3 weak #6, hardware half): the
    # dp-fused chain (parallel/fused_dp.py:53-55) seeds shard i with
    # base + i*1000003; per-shard kernels are otherwise independent, so
    # running the 8 shard programs serially on one chip IS the dp noise
    # distribution.  Check the stationary law on EVERY shard and that all
    # shard streams differ pairwise (flagship dims, B=1024/8 per shard).
    B11, T11, lr11 = 128, 3000, 0.02
    params11, _, _ = setup("relu", B=B11)
    params11 = tuple(
        {"w": jnp.zeros_like(p["w"]), "b": p["b"]} for p in params11
    )
    latents11 = model.init_latents(params11, jnp.zeros((B11, 20)), key)
    shard_lats = []
    for s in range(8):
        shard_seed = jnp.int32(11 + s * 1000003)
        lat_s, _ = mcpc_chain_pallas(
            params11, latents11, None, shard_seed, T=T11, lr=lr11,
            noise_var=2.0, loss="none",
        )
        shard_lats.append(lat_s)
    exp_var = 1.0 / (1.0 - lr11 / 2.0)
    for s, lat_s in enumerate(shard_lats):
        for i, x in enumerate(lat_s):
            b = np.asarray(params11[i]["b"])
            d = np.asarray(x) - b[None, :]
            m, v = float(d.mean()), float(d.var())
            assert abs(m) < 0.1, (s, i, m)
            assert abs(v - exp_var) < 0.1 * exp_var, (s, i, v, exp_var)
    for s in range(7):
        assert not np.allclose(
            np.asarray(shard_lats[s][1][:4]),
            np.asarray(shard_lats[s + 1][1][:4]),
        ), s
    print(f"dp shard noise law OK: 8 shards, var target {exp_var:.4f}")

    # 12) warm continuation on hardware: two T=20 continuation dispatches
    # (live Adam moments in) must match one T=40 fresh dispatch
    params12, latents12, target12 = setup("relu", B=256)
    lat_a, _, _, mv = mcpc_chain_pallas(
        params12, latents12, target12, jnp.int32(13), T=0, lr=0.05,
        noise_var=None, loss="bernoulli", warm_T=20, warm_lr=0.05,
        return_scalars=True, emit_warm_opt_state=True,
    )
    from montecarlopredictivecoding_tpu.ops.pallas_mcpc import aligned_layout

    lat_dims = [x.shape[1] for x in latents12]
    _pads, offs, _XW = aligned_layout(lat_dims)
    mu_t = tuple(mv[0][:, o : o + d] for o, d in zip(offs, lat_dims))
    nu_t = tuple(mv[1][:, o : o + d] for o, d in zip(offs, lat_dims))
    lat_b, _, _, _ = mcpc_chain_pallas(
        params12, lat_a, target12, jnp.int32(13), T=0, lr=0.05,
        noise_var=None, loss="bernoulli", warm_T=20, warm_lr=0.05,
        return_scalars=True, emit_warm_opt_state=True,
        warm_mu=mu_t, warm_nu=nu_t, warm_count=jnp.int32(20),
    )
    lat_full, _, _, _ = mcpc_chain_pallas(
        params12, latents12, target12, jnp.int32(13), T=0, lr=0.05,
        noise_var=None, loss="bernoulli", warm_T=40, warm_lr=0.05,
        return_scalars=True, emit_warm_opt_state=True,
    )
    # Adam-mode comparison => quantile gate, same as benchmarks/hw_parity.py:
    # Adam normalizes updates to ~±lr, so elements whose gradient sits at the
    # rounding boundary flip sign between the chunked (HBM moment round-trip,
    # SMEM bias powers) and fused 40-step paths; the bulk matches tightly
    # while isolated elements drift a few update quanta (first hardware run:
    # 18/5120 = 0.35% out of 5e-4, max abs 0.0099).
    for a, b in zip(lat_b, lat_full):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b)
        tol = 5e-4 + 5e-4 * np.abs(b)
        frac = float((d > tol).mean())
        assert frac < 0.01, f"warm continuation: {frac:.2%} out of tolerance"
        assert d.max() < 0.2, f"warm continuation: max abs diff {d.max():.3f}"
    print("warm continuation OK (2x20 == 1x40 on hardware, quantile gate)")

    # (A former leg 13 gated two alternative noise schedulings,
    # noise_prefetch/noise_rsqrt; both were deleted after the round-5
    # hardware A/B showed the plain loop faster at every batch —
    # hw_transcripts/r5/r5_prefetch_fixed.log, EVAL_r5.md item 5.)

    print("KERNEL_SANITY_PASS")


if __name__ == "__main__":
    main()
