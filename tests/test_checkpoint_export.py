"""Torch EXPORT shim: checkpoints trained here must run in the reference
code unchanged (the inverse of the import shim, completing the interop
story both ways).  Skipped when torch or the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.utils.checkpoint import (
    dlgm_params_to_torch_state_dict,
    load_torch_state_dict,
    params_to_torch_state_dict,
    save_torch_state_dict,
    torch_dlgm_state_dict_to_params,
    torch_state_dict_to_params,
)

torch = pytest.importorskip("torch")

REF = "/root/reference"
REF_DLGM = os.path.join(REF, "Deep_Latent_Gaussian_Models")


def test_mlp_export_round_trips(tmp_path):
    model = mcpc.make_mlp_model(4, 8, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "export.pth")
    save_torch_state_dict(path, model, params)
    back = load_torch_state_dict(path, model)  # shape-validated against model
    for p, q in zip(params, back):
        np.testing.assert_array_equal(np.asarray(p["w"]), np.asarray(q["w"]))
        np.testing.assert_array_equal(np.asarray(p["b"]), np.asarray(q["b"]))


def test_mlp_export_key_layout_matches_reference_convention():
    """Exported keys use the Sequential module indices of the reference's
    4-Linear MLP builder (utils/model.py:47-69 -> Linears at 0,3,6,9) —
    the layout every shipped reference checkpoint uses."""
    model = mcpc.make_mlp_model(4, 8, 8, 12)
    params = model.init(jax.random.PRNGKey(0))
    sd = params_to_torch_state_dict(model, params)
    assert sorted(sd) == sorted(
        f"{i}.{kind}" for i in (0, 3, 6, 9) for kind in ("weight", "bias")
    )
    assert tuple(sd["0.weight"].shape) == (4, 4)  # torch [out, in]
    assert tuple(sd["9.weight"].shape) == (12, 8)


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "predictive_coding")),
    reason="reference checkout not available",
)
def test_mlp_export_runs_in_reference_model():
    """Forward parity: our trained params, exported, loaded strict=False
    into the actual torch Sequential the reference builds."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import predictive_coding as ref_pc  # noqa: E402

    tnn = torch.nn
    dims = (4, 8, 8, 12)
    model = mcpc.make_mlp_model(*dims)
    params = model.init(jax.random.PRNGKey(1))
    gen = mcpc.GenerativeModel(model, key=0, params=params)

    tmodel = tnn.Sequential(
        tnn.Linear(dims[0], dims[0]), ref_pc.PCLayer(), tnn.ReLU(),
        tnn.Linear(dims[0], dims[1]), ref_pc.PCLayer(), tnn.ReLU(),
        tnn.Linear(dims[1], dims[2]), ref_pc.PCLayer(), tnn.ReLU(),
        tnn.Linear(dims[2], dims[3]),
    )
    missing, unexpected = tmodel.load_state_dict(
        params_to_torch_state_dict(model, params), strict=False
    )
    assert not missing and not unexpected
    tmodel.eval()

    x = np.random.default_rng(0).standard_normal((7, dims[0])).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(gen.predict(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-5)


def _simple_dlgm_params(latent=4, hidden=16, key=0):
    """Simple-topology (fc3/fc4 one-latent-level) DLGM params — the layout
    the import shim produces and our generative/recognition_forward simple
    branches consume, i.e. what an import -> fine-tune-here -> export-back
    workflow carries."""
    rng = np.random.default_rng(key)
    free = latent * (latent + 1) // 2  # CholeskyFactor free-parameter size

    def lin(i, o):
        return {
            "w": jnp.asarray(rng.standard_normal((i, o)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.standard_normal((o,)).astype(np.float32) * 0.1),
        }

    gen = {"fc3": lin(latent, hidden), "fc4": lin(hidden, 784)}
    rec = {"nets": [{"fc1": lin(784, hidden), "mu": lin(hidden, latent),
                     "cov": lin(hidden, free)}]}
    return gen, rec


def test_dlgm_export_round_trips():
    gen_params, rec_params = _simple_dlgm_params()
    sd = dlgm_params_to_torch_state_dict(gen_params, rec_params)
    gen_back, rec_back = torch_dlgm_state_dict_to_params(sd)
    np.testing.assert_array_equal(
        np.asarray(gen_params["fc3"]["w"]), np.asarray(gen_back["fc3"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(rec_params["nets"][0]["cov"]["b"]),
        np.asarray(rec_back["nets"][0]["cov"]["b"]),
    )


def test_dlgm_export_rejects_stacked():
    with pytest.raises(ValueError, match="simple"):
        dlgm_params_to_torch_state_dict({"T": []}, {"nets": []})


@pytest.mark.skipif(
    not os.path.isdir(REF_DLGM), reason="reference DLGM code not available"
)
def test_dlgm_export_runs_in_reference_modules():
    """Our DLGM, exported in the reference's nested save format, loaded by
    the actual reference GenerativeModel/RecognitionModel: generative probs
    and posterior (mu, R) match."""
    if REF_DLGM not in sys.path:
        sys.path.insert(0, REF_DLGM)
    import cholesky_factor as ref_cf  # noqa: E402
    import generative as ref_gen  # noqa: E402
    import recognition as ref_rec  # noqa: E402

    from montecarlopredictivecoding_tpu.models.cholesky import CholeskyFactor
    from montecarlopredictivecoding_tpu.models.dlgm import (
        generative_forward,
        recognition_forward,
    )

    hidden, latent = 16, 4
    gen_params, rec_params = _simple_dlgm_params(latent, hidden, key=1)
    factors = [CholeskyFactor(latent)]
    sd = dlgm_params_to_torch_state_dict(gen_params, rec_params)

    gm = ref_gen.GenerativeModel(latent_dim=latent, hidden_dim=hidden)
    rm = ref_rec.RecognitionModel(
        latent_dim=latent, hidden_dim=hidden,
        chol_factor_cls=ref_cf.CholeskyFactor,
    )
    gm.load_state_dict(sd["generative_model"])
    rm.load_state_dict(sd["recognition_model"])
    gm.eval(), rm.eval()

    rng = np.random.default_rng(0)
    z = rng.standard_normal((8, latent)).astype(np.float32)
    x = (rng.random((8, 784)) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref_probs = gm(torch.from_numpy(z)).numpy()
        ref_mu, ref_R = rm(torch.from_numpy(x))
    ours_probs = np.asarray(generative_forward(gen_params, [jnp.asarray(z)]))
    mus, Rs = recognition_forward(rec_params, factors, jnp.asarray(x))
    np.testing.assert_allclose(ours_probs, ref_probs, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mus[0]), ref_mu.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Rs[0]), ref_R.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# ResNet-9 shim (import AND export)


def _torch_resnet9(is_mask):
    """The ACTUAL reference model class (ResNet9.py:12-53), extracted by
    AST so the file's module-level imports (utils.data -> torchvision,
    absent in this image) never execute — the class bodies run verbatim."""
    import ast

    src = open(os.path.join(REF, "ResNet9.py")).read()
    tree = ast.parse(src)
    wanted = [
        n for n in tree.body
        if isinstance(n, (ast.ClassDef, ast.FunctionDef))
        and n.name in ("Mish", "conv_block", "ResNet9")
    ]
    ns = {"nn": torch.nn, "torch": torch, "F": torch.nn.functional}
    exec(
        compile(ast.Module(body=wanted, type_ignores=[]), "ResNet9.py", "exec"),
        ns,
    )
    torch.manual_seed(0)
    m = ns["ResNet9"](in_channels=1, num_classes=10, is_mask=is_mask)
    m.eval()
    return m


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "ResNet9.py")),
    reason="reference checkout not available",
)
@pytest.mark.parametrize("is_mask", [False, True])
def test_resnet9_import_forward_parity(is_mask):
    """torch ResNet-9 state dict -> our Flax variables: same eval-mode
    logits (covers the conv/BN layout transposes and, for the masked
    variant's 768-wide head, the NCHW->NHWC flatten permutation)."""
    from montecarlopredictivecoding_tpu.models.resnet9 import ResNet9
    from montecarlopredictivecoding_tpu.utils import (
        resnet9_from_torch_state_dict,
    )

    tm = _torch_resnet9(is_mask)
    params, stats = resnet9_from_torch_state_dict(tm.state_dict(), is_mask)

    h = 14 if is_mask else 28
    x = np.random.default_rng(0).standard_normal((4, 1, h, 28)).astype(np.float32)
    with torch.no_grad():
        ref_logits = tm(torch.from_numpy(x)).numpy()
    model = ResNet9(is_mask=is_mask)
    ours = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
            train=False,
        )
    )
    np.testing.assert_allclose(ours, ref_logits, atol=2e-4)


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "ResNet9.py")),
    reason="reference checkout not available",
)
@pytest.mark.parametrize("is_mask", [False, True])
def test_resnet9_export_strict_load_and_round_trip(is_mask):
    """Our Flax ResNet-9, exported, strict-loads into the reference model;
    import of the export reproduces our variables bit-for-bit."""
    from montecarlopredictivecoding_tpu.models.resnet9 import init_resnet9
    from montecarlopredictivecoding_tpu.utils import (
        resnet9_from_torch_state_dict,
        resnet9_to_torch_state_dict,
    )

    _, _, state = init_resnet9(jax.random.PRNGKey(2), is_mask=is_mask)
    sd = resnet9_to_torch_state_dict(state.params, state.batch_stats, is_mask)
    tm = _torch_resnet9(is_mask)
    tm.load_state_dict(sd)  # strict: every key must match exactly

    p_back, s_back = resnet9_from_torch_state_dict(sd, is_mask)
    flat = jax.tree_util.tree_leaves_with_path
    for (ka, a), (kb, b) in zip(flat(state.params), flat(p_back)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for (ka, a), (kb, b) in zip(flat(state.batch_stats), flat(s_back)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
