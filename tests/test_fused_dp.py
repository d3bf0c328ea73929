"""Data-parallel fused chain: 8-way sharded run must equal the single-device
kernel on the full batch (noise off; grads psum exactly)."""

import jax
import jax.numpy as jnp
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.ops import mcpc_chain_pallas
from montecarlopredictivecoding_tpu.parallel import make_mesh
from montecarlopredictivecoding_tpu.parallel.fused_dp import make_dp_fused_chain, place_dp


def test_dp_fused_chain_matches_single_device():
    model = mcpc.make_mlp_model(4, 8, 8, 16)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    B = 16
    latents = model.init_latents(params, jnp.zeros((B, 4)), key)
    target = (jax.random.uniform(key, (B, 16)) > 0.5).astype(jnp.float32)
    T, mixing, lr = 10, 4, 0.02

    # single-device reference
    ref_lat, ref_pg = mcpc_chain_pallas(
        params, latents, target, jnp.int32(0),
        T=T, lr=lr, noise_var=None, loss="bernoulli",
        mixing=mixing, with_pgrads=True, interpret=True,
    )

    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    fn = make_dp_fused_chain(
        model, mesh, T=T, lr=lr, noise_var=None, loss="bernoulli",
        mixing=mixing, with_pgrads=True, interpret=True,
    )
    p, l, t = place_dp(mesh, params, latents, target)
    dp_lat, dp_pg = fn(p, l, t, jnp.int32(0))

    for a, b in zip(ref_lat, dp_lat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for pa, pb in zip(ref_pg, dp_pg):
        np.testing.assert_allclose(
            np.asarray(pa["w"]), np.asarray(pb["w"]), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(pa["b"]), np.asarray(pb["b"]), atol=3e-4
        )
