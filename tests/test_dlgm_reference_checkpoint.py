"""Parity against the reference's SHIPPED trained DLGM checkpoint.

The reference repo ships one real trained artifact —
``Deep_Latent_Gaussian_Models/checkpoints/GenerativeModel_RecognitionModel_
CholeskyFactor.pth`` (the simple GenerativeModel/RecognitionModel topology,
generative.py:5-16 / recognition.py:8-32, loaded by evaluate.py:58-60).
These tests import it through our torch shim and run the ACTUAL reference
torch modules side by side: forward probabilities, posterior (mu, R), the
ELBO loss, and the importance-sampled -ln p(v) headline metric must agree.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_DLGM = "/root/reference/Deep_Latent_Gaussian_Models"
CKPT = os.path.join(
    REF_DLGM, "checkpoints",
    "GenerativeModel_RecognitionModel_CholeskyFactor.pth",
)
pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference DLGM checkpoint not present"
)

from montecarlopredictivecoding_tpu.models.cholesky import (
    CholeskyFactor,
    factor_from_free_size,
)
from montecarlopredictivecoding_tpu.models.dlgm import (
    DLGM,
    dlgm_loss,
    generative_forward,
    recognition_forward,
)
from montecarlopredictivecoding_tpu.utils.checkpoint import load_torch_dlgm


@pytest.fixture(scope="module")
def both_sides():
    gen, rec = load_torch_dlgm(CKPT)
    latent = int(gen["fc3"]["w"].shape[0])
    factor = factor_from_free_size(latent, int(rec["nets"][0]["cov"]["w"].shape[1]))
    assert isinstance(factor, CholeskyFactor)

    if REF_DLGM not in sys.path:
        sys.path.insert(0, REF_DLGM)
    import cholesky_factor as ref_cf  # noqa: E402
    import generative as ref_gen  # noqa: E402
    import recognition as ref_rec  # noqa: E402

    gm = ref_gen.GenerativeModel()
    rm = ref_rec.RecognitionModel(chol_factor_cls=ref_cf.CholeskyFactor)
    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    gm.load_state_dict(sd["generative_model"])
    rm.load_state_dict(sd["recognition_model"])
    gm.eval(), rm.eval()

    rng = np.random.default_rng(0)
    z = rng.standard_normal((64, latent)).astype(np.float32)
    # binarized synthetic digits: near-manifold inputs for the MNIST-trained
    # checkpoint (keeps saturation rare and importance weights well-behaved)
    from montecarlopredictivecoding_tpu.data.mnist import _synthetic_mnist

    (xtr, _), _ = _synthetic_mnist(64, 1, seed=0)
    x = (xtr.reshape(64, 784) > 0.5).astype(np.float32)
    return gen, rec, factor, gm, rm, z, x


def test_generative_forward_parity(both_sides):
    gen, _, _, gm, _, z, _ = both_sides
    with torch.no_grad():
        ref = gm(torch.from_numpy(z)).numpy()
    ours = np.asarray(generative_forward(gen, [jnp.asarray(z)]))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_recognition_forward_parity(both_sides):
    _, rec, factor, _, rm, _, x = both_sides
    with torch.no_grad():
        ref_mu, ref_R = rm(torch.from_numpy(x))
    mus, Rs = recognition_forward(rec, [factor], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mus[0]), ref_mu.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Rs[0]), ref_R.numpy(), atol=1e-5)


def test_elbo_loss_parity(both_sides):
    """Deterministic ELBO at z = mu: our dlgm_loss == reference
    loss_function on the trained weights."""
    gen, rec, factor, gm, rm, _, x = both_sides
    sys.path.insert(0, REF_DLGM)
    try:
        import losses as ref_losses  # noqa: E402
    finally:
        sys.path.pop(0)
    with torch.no_grad():
        mu_t, R_t = rm(torch.from_numpy(x))
        recon_t = gm(mu_t)
        ref = float(
            ref_losses.loss_function(recon_t, torch.from_numpy(x), mu_t, R_t)
        )
    mus, Rs = recognition_forward(rec, [factor], jnp.asarray(x))
    recon = generative_forward(gen, [mus[0]])
    ours = float(dlgm_loss(recon, jnp.asarray(x), mus, Rs))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_importance_nll_parity(both_sides):
    """The headline DLGM metric — importance-sampled -ln p(v)
    (reference evaluate.py:65-104) — computed by BOTH implementations on
    the same data with the same trained weights.  The two use independent
    particle draws, so single estimates scatter (measured std ~0.45 nats at
    P=256); compare MEANS over R=4 seeded draws per side (SE of the
    difference ~0.3 nats, so the 1-nat gate is >3 sigma) — and seed torch
    explicitly, or the reference side inherits whatever global-RNG state
    earlier tests in the process left behind (an in-suite flake seen at
    round 5: a 1.48-nat single-draw pair)."""
    gen, rec, factor, gm, rm, _, x = both_sides
    x32 = x[:32]
    P, R_DRAWS = 256, 4

    # reference estimator (mirrors evaluate.py's loop, written independently;
    # evaluate.py:80 scores p(v|z) via -F.binary_cross_entropy — keep its
    # exact -100 clamp semantics, no probability clipping)
    import torch.nn.functional as F

    ref_vals = []
    for seed in range(R_DRAWS):
        torch.manual_seed(seed)
        with torch.no_grad():
            data = torch.from_numpy(x32).repeat(P, 1)
            mu, R = rm(data)
            z = rm.sample(mu, R)
            recon = gm(z)
            log_px_z = -F.binary_cross_entropy(
                recon, data, reduction="none"
            ).sum(-1)
            log_prior = gm.log_prob_prior(z)
            log_q = rm.log_prob(z, mu, R)
            log_w = (log_px_z + log_prior - log_q).reshape(P, 32).T
            ref_vals.append(
                float(-(torch.logsumexp(log_w, dim=1) - np.log(P)).sum() / 32)
            )

    dlgm = DLGM(784, 400, int(gen["fc3"]["w"].shape[0]), key=0)
    dlgm.gen_params, dlgm.rec_params = gen, rec
    dlgm.latent_dim_list = [int(gen["fc3"]["w"].shape[0])]
    dlgm.factors = [factor]
    ours_vals = [
        dlgm.evaluate_importance_nll([(jnp.asarray(x32), None)], particle_size=P)
        for _ in range(R_DRAWS)  # next_key() advances: independent draws
    ]
    gap = abs(float(np.mean(ours_vals)) - float(np.mean(ref_vals)))
    assert gap < 1.0, (ours_vals, ref_vals)
