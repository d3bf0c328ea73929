"""Legacy stacked-DLGM zoo tests + torch DLGM checkpoint shim."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlopredictivecoding_tpu.models.cholesky import CholeskyFactor, DiagonalFactor
from montecarlopredictivecoding_tpu.models.dlgm_stacked import (
    MNIST_PRESETS,
    StackedMetrics,
    generative_stacked_forward,
    init_generative_stacked,
    init_recognition_stacked,
    log_prob_prior,
    recognition_log_prob,
    recognition_sample_stacked,
    recognition_stacked_forward,
    sample_prior_stacked,
    stacked_loss,
)


def test_stacked_generative_shapes(key):
    params = init_generative_stacked(
        key, hidden_dim_list=[6, 5], latent_dim_list=[6, 5],
        T_hidden_dim_list=[7, 7], output_dim=12,
    )
    z = sample_prior_stacked(key, 3, [6, 5])
    out = generative_stacked_forward(params, z)
    assert out.shape == (3, 12)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    lp = log_prob_prior(z)
    assert lp.shape == (3,)


def test_presets_constructible(key):
    params = init_generative_stacked(key, **MNIST_PRESETS["mnist_vae"])
    z = sample_prior_stacked(key, 2, params["latent_dim_list"])
    assert generative_stacked_forward(params, z).shape == (2, 784)


def test_recognition_log_prob_matches_gaussian(key):
    # with diagonal factor, log_prob must equal the product of 1-D normals
    rec, factors = init_recognition_stacked(
        key, [3], [8], factor_cls=DiagonalFactor, input_dim=10
    )
    x = jax.random.normal(key, (4, 10))
    mus, Rs = recognition_stacked_forward(rec, factors, x)
    z = recognition_sample_stacked(key, mus, Rs)
    lp = recognition_log_prob(z, mus, Rs)
    sd = Rs[0][:, jnp.arange(3), jnp.arange(3)]
    manual = jnp.sum(
        -0.5 * ((z[0] - mus[0]) / sd) ** 2 - jnp.log(sd) - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(manual), rtol=1e-5)


def test_stacked_metrics_pipeline(key):
    gen = init_generative_stacked(
        key, hidden_dim_list=[4, 4], latent_dim_list=[4, 4],
        T_hidden_dim_list=[5, 5], output_dim=16,
    )
    rec, factors = init_recognition_stacked(
        key, [4, 4], [8, 8], factor_cls=CholeskyFactor, input_dim=16
    )
    metrics = StackedMetrics(gen, rec, factors, key=0)
    rng = np.random.RandomState(0)
    data = jnp.asarray((rng.rand(8, 16) > 0.5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, 8))
    batches = [(data, labels)]
    assert metrics.generate(5).shape == (5, 16)
    assert 0 <= metrics.get_mse_rec(batches) <= 1
    ml = metrics.get_marginal_likelihood(batches, n_samples=32)
    assert np.isfinite(ml) and ml < 0
    nll = metrics.importance_nll(batches, particle_size=4)
    assert np.isfinite(nll) and nll > 0


def test_torch_dlgm_checkpoint_shim():
    torch = pytest.importorskip("torch")
    path = "/root/reference/models/dlgm_fid_1"
    if not os.path.isfile(path):
        pytest.skip("reference DLGM checkpoint missing")
    from montecarlopredictivecoding_tpu.models.dlgm import (
        generative_forward,
        recognition_forward,
        sample_prior,
    )
    from montecarlopredictivecoding_tpu.models.cholesky import RankOneFactor
    from montecarlopredictivecoding_tpu.utils.checkpoint import load_torch_dlgm

    gen_params, rec_params = load_torch_dlgm(path)
    dims = [gen_params["bias"].shape[0]] + [t["w"].shape[1] for t in gen_params["T"]]
    z = sample_prior(jax.random.PRNGKey(0), 4, dims)
    probs = generative_forward(gen_params, z)
    assert probs.shape == (4, 784)
    assert float(probs.min()) >= 0 and float(probs.max()) <= 1
    factors = [RankOneFactor(n["mu"]["w"].shape[1]) for n in rec_params["nets"]]
    mus, Rs = recognition_forward(rec_params, factors, jnp.zeros((2, 784)))
    assert mus[0].shape == (2, dims[0])
    assert Rs[0].shape == (2, dims[0], dims[0])
