"""Fixed-input parity tests of the metric stack against the REFERENCE's own
torch evaluation functions (VERDICT r1 Missing #2): get_mse_rec,
get_marginal_likelihood, and the FID Fréchet-distance numerics.

The reference modules are imported from the read-only checkout; torchvision
(not installed in this environment, and unused by the code paths under test)
is stubbed before import.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import montecarlopredictivecoding_tpu as mcpc

REF = "/root/reference"
torch = pytest.importorskip("torch")
scipy_linalg = pytest.importorskip("scipy.linalg")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "utils")),
    reason="reference checkout not available",
)


def _stub_torchvision():
    """The reference's utils modules import torchvision at module level but
    the functions under test never touch it; stub the import surface."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    for sub in ("utils", "transforms", "datasets"):
        m = types.ModuleType(f"torchvision.{sub}")
        sys.modules[f"torchvision.{sub}"] = m
        setattr(tv, sub, m)
    sys.modules["torchvision.utils"].save_image = lambda *a, **k: None
    sys.modules["torchvision"] = tv


def _ref_modules():
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import predictive_coding as ref_pc  # noqa
    import utils.model as ref_model  # noqa
    import utils.training_evaluation as ref_te  # noqa

    return ref_pc, ref_model, ref_te


def _matched_pair(dims=(6, 8, 8, 16), seed=0):
    """Torch and jax canonical 4-Linear relu models with identical weights
    and CONSTANT latent init (deterministic MAP parity)."""
    ref_pc, ref_model, _ = _ref_modules()
    tnn = torch.nn

    torch.manual_seed(seed)
    d0, d1, d2, D = dims
    tmodel = tnn.Sequential(
        tnn.Linear(d0, d0),
        ref_pc.PCLayer(sample_x_fn=ref_model.sample_x_fn_cte),
        tnn.ReLU(),
        tnn.Linear(d0, d1),
        ref_pc.PCLayer(sample_x_fn=ref_model.sample_x_fn_cte),
        tnn.ReLU(),
        tnn.Linear(d1, d2),
        ref_pc.PCLayer(sample_x_fn=ref_model.sample_x_fn_cte),
        tnn.ReLU(),
        tnn.Linear(d2, D),
    )
    tmodel.train()

    jmodel = mcpc.make_mlp_model(d0, d1, d2, D, sample_x_fn=mcpc.sample_x_fn_cte)
    params = []
    for m in tmodel:
        if isinstance(m, tnn.Linear):
            params.append(
                {
                    "w": jnp.asarray(m.weight.detach().numpy().T.copy()),
                    "b": jnp.asarray(m.bias.detach().numpy().copy()),
                }
            )
    gen = mcpc.GenerativeModel(jmodel, key=0, params=tuple(params))
    return tmodel, gen


def test_mse_rec_matches_reference_torch():
    """Our get_mse_rec == the reference's get_mse_rec on the same model,
    weights, data and MAP schedule (training_evaluation.py:143-174)."""
    _, ref_model, ref_te = _ref_modules()
    from montecarlopredictivecoding_tpu.eval.metrics import get_mse_rec

    dims = (6, 8, 8, 16)
    tmodel, gen = _matched_pair(dims)
    B = 10
    rng = np.random.RandomState(3)
    data_np = (rng.rand(B, dims[-1]) > 0.5).astype(np.float32)

    cfg_common = dict(
        input_size=dims[0],
        input_var=None,
        T_pc=40,
    )
    ref_cfg = {
        **cfg_common,
        "loss_fn": ref_model.bernoulli_fn,
        "optimizer_x_fn_pc": torch.optim.Adam,
        "optimizer_x_kwargs_pc": {"lr": 0.1},
    }
    our_cfg = {
        **cfg_common,
        "loss_fn": mcpc.bernoulli_fn,
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.1},
    }
    loader = [(torch.tensor(data_np), torch.zeros(B))]
    ref_mse = float(ref_te.get_mse_rec(tmodel, ref_cfg, loader, use_cuda=False))

    batches = [(jnp.asarray(data_np), jnp.zeros(B))]
    our_mse = float(get_mse_rec(gen, our_cfg, batches))

    np.testing.assert_allclose(our_mse, ref_mse, rtol=1e-5, atol=1e-7)


def test_marginal_likelihood_matches_reference_torch(monkeypatch):
    """Our get_marginal_likelihood == the reference's, given identical
    (mocked) ancestral samples (training_evaluation.py:177-206)."""
    _, ref_model, ref_te = _ref_modules()
    import montecarlopredictivecoding_tpu.eval.metrics as our_metrics

    D, S, N = 16, 64, 12
    rng = np.random.RandomState(7)
    samples_np = rng.randn(S, D).astype(np.float32) * 5.0
    data_np = (rng.rand(N, D) > 0.5).astype(np.float32)

    monkeypatch.setattr(
        ref_te, "sample_pc", lambda *a, **k: torch.tensor(samples_np)
    )
    monkeypatch.setattr(
        our_metrics, "sample_pc", lambda *a, **k: jnp.asarray(samples_np)
    )

    from torch.utils.data import DataLoader, TensorDataset

    ds = TensorDataset(torch.tensor(data_np), torch.zeros(N))
    ref_cfg = {"loss_fn": ref_model.bernoulli_fn, "input_var": None}
    ref_ml = float(
        ref_te.get_marginal_likelihood(
            None, ref_cfg, DataLoader(ds, batch_size=N), use_cuda=False,
            n_samples=S,
        )
    )

    our_cfg = {"loss_fn": mcpc.bernoulli_fn, "input_var": None}
    our_ml = float(
        our_metrics.get_marginal_likelihood(
            None, our_cfg, [(jnp.asarray(data_np), jnp.zeros(N))], n_samples=S
        )
    )
    np.testing.assert_allclose(our_ml, ref_ml, rtol=1e-5)


def test_fid_matches_pytorch_fid_formula():
    """Our eigh-based Fréchet distance == pytorch-fid's
    calculate_frechet_distance numerics (scipy.linalg.sqrtm form):
    d^2 = |mu1-mu2|^2 + tr(C1 + C2 - 2 sqrtm(C1 C2))."""
    from montecarlopredictivecoding_tpu.eval.fid import compute_fid, compute_stats

    rng = np.random.RandomState(11)
    f1 = rng.randn(500, 24) @ rng.randn(24, 24) + rng.randn(24)
    f2 = rng.randn(400, 24) @ rng.randn(24, 24) * 1.3 + rng.randn(24)
    s1, s2 = compute_stats(f1), compute_stats(f2)

    diff = s1.mu - s2.mu
    covmean = scipy_linalg.sqrtm(s1.sigma @ s2.sigma)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    ref = float(
        diff @ diff + np.trace(s1.sigma) + np.trace(s2.sigma)
        - 2.0 * np.trace(covmean)
    )
    ours = compute_fid(s1, s2)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
