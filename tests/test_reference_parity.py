"""Parity tests against the reference implementation (skipped when the
read-only reference checkout or torch is unavailable).

These validate, numerically, that the rebuilt engine reproduces the
reference's behavior:

* checkpoint shim: a shipped reference checkpoint loaded into our params
  gives the same eval-mode forward pass as the torch model;
* deterministic PC inference: identical latent trajectories (SGD, fixed
  init) over T steps;
* MCPC weight update: identical parameter step given the same latent
  trajectory (noise disabled, SGD on x, SGD on p).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

import montecarlopredictivecoding_tpu as mcpc

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "predictive_coding")),
    reason="reference checkout not available",
)


def _ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import predictive_coding as ref_pc  # noqa

    return ref_pc


def _build_pair(dims=(3, 3, 5), seed=0):
    """Matching torch and jax models with identical params."""
    ref_pc = _ref_modules()
    tnn = torch.nn

    torch.manual_seed(seed)
    tmodel = tnn.Sequential(
        tnn.Linear(dims[0], dims[0]),
        ref_pc.PCLayer(),
        tnn.Tanh(),
        tnn.Linear(dims[0], dims[1]),
        ref_pc.PCLayer(),
        tnn.Tanh(),
        tnn.Linear(dims[1], dims[2]),
    )
    tmodel.train()

    jmodel = mcpc.PCModel(
        [
            mcpc.Linear(dims[0], dims[0]),
            mcpc.PC(),
            mcpc.Activation("tanh"),
            mcpc.Linear(dims[0], dims[1]),
            mcpc.PC(),
            mcpc.Activation("tanh"),
            mcpc.Linear(dims[1], dims[2]),
        ]
    )
    # .copy() matters: on CPU, jnp.asarray may zero-copy the numpy view of a
    # torch tensor, and torch later updates those weights in place.
    params = tuple(
        {
            "w": jnp.asarray(m.weight.detach().numpy().T.copy()),
            "b": jnp.asarray(m.bias.detach().numpy().copy()),
        }
        for m in tmodel
        if isinstance(m, tnn.Linear)
    )
    return tmodel, jmodel, params


def test_checkpoint_shim_forward_parity():
    from montecarlopredictivecoding_tpu.utils import load_torch_state_dict

    path = os.path.join(REF, "models", "mcpc_fid_1")
    if not os.path.isfile(path):
        pytest.skip("reference checkpoint missing")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = load_torch_state_dict(path)
    # infer dims from the checkpoint and build the matching model
    dims = [params[0]["w"].shape[0]] + [p["w"].shape[1] for p in params]
    jmodel = mcpc.make_mlp_model(dims[0], dims[2], dims[3], dims[4])
    gen = mcpc.GenerativeModel(jmodel, key=0, params=params)

    # torch eval-mode forward (PCLayer = identity)
    tnn = torch.nn
    tmodel = tnn.Sequential(
        tnn.Linear(dims[0], dims[1]),
        tnn.Identity(),
        tnn.ReLU(),
        tnn.Linear(dims[1], dims[2]),
        tnn.Identity(),
        tnn.ReLU(),
        tnn.Linear(dims[2], dims[3]),
        tnn.Identity(),
        tnn.ReLU(),
        tnn.Linear(dims[3], dims[4]),
    )
    with torch.no_grad():
        for i, mi in ((0, 0), (3, 3), (6, 6), (9, 9)):
            tmodel[i].weight.copy_(sd[f"{mi}.weight"])
            tmodel[i].bias.copy_(sd[f"{mi}.bias"])
        x = torch.randn(7, dims[0])
        t_out = tmodel(x).numpy()
    j_out = np.asarray(gen.predict(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)


def test_pc_inference_trajectory_parity():
    """T steps of SGD MAP descent on latents: same trajectory as torch."""
    ref_pc = _ref_modules()
    import torch.optim as optim

    tmodel, jmodel, params = _build_pair()
    B, T, lr, var = 4, 12, 0.05, 0.7
    torch.manual_seed(1)
    data_t = torch.randn(B, 5)
    inputs_t = torch.zeros(B, 3)

    def fe_t(output, _target, _var):
        return (1 / _var) * 0.5 * (output - _target).pow(2).sum()

    trainer = ref_pc.PCTrainer(
        tmodel,
        T=T,
        update_x_at="all",
        optimizer_x_fn=optim.SGD,
        optimizer_x_kwargs={"lr": lr},
        update_p_at="never",
        plot_progress_at=[],
    )
    res_t = trainer.train_on_batch(
        inputs=inputs_t,
        loss_fn=fe_t,
        loss_fn_kwargs={"_target": data_t, "_var": var},
        is_log_progress=False,
        is_return_results_every_t=True,
        is_checking_after_callback_after_t=False,
    )
    xs_t = [x.detach().numpy() for x in trainer.get_model_xs()]

    gen = mcpc.GenerativeModel(jmodel, key=0, params=params)
    jtr = mcpc.PCTrainer(
        gen,
        T=T,
        update_x_at="all",
        optimizer_x_fn="sgd",
        optimizer_x_kwargs={"lr": lr},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    res_j = jtr.train_on_batch(
        jnp.zeros((B, 3)),
        loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={"_target": jnp.asarray(data_t.numpy()), "_var": var},
    )
    # default sample_x_fn (x = mu) is deterministic -> trajectories must match
    for xt, xj in zip(xs_t, gen.latents):
        np.testing.assert_allclose(np.asarray(xj), xt, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res_j["overall"]),
        np.asarray(res_t["overall"]),
        rtol=1e-4,
    )


def test_mcpc_weight_update_parity():
    """Noise-free 'MCPC' config (accumulate window + SGD p-step): parameter
    updates must match torch's grad-accumulation + division semantics."""
    ref_pc = _ref_modules()
    import torch.optim as optim

    tmodel, jmodel, params = _build_pair(seed=2)
    B, lr_x, lr_p, var = 4, 0.05, 0.1, 1.0
    mixing, sampling = 3, 5
    T = mixing + sampling
    torch.manual_seed(3)
    data_t = torch.randn(B, 5)

    trainer = ref_pc.PCTrainer(
        tmodel,
        T=T,
        update_x_at="all",
        optimizer_x_fn=optim.SGD,
        optimizer_x_kwargs={"lr": lr_x},
        update_p_at="last",
        accumulate_p_at=[mixing + i for i in range(sampling)],
        optimizer_p_fn=optim.SGD,
        optimizer_p_kwargs={"lr": lr_p},
        plot_progress_at=[],
    )

    def fe_t(output, _target, _var):
        return (1 / _var) * 0.5 * (output - _target).pow(2).sum()

    trainer.train_on_batch(
        inputs=torch.zeros(B, 3),
        loss_fn=fe_t,
        loss_fn_kwargs={"_target": data_t, "_var": var},
        is_log_progress=False,
        is_return_results_every_t=False,
        is_checking_after_callback_after_t=False,
    )
    t_params = [
        (m.weight.detach().numpy().T, m.bias.detach().numpy())
        for m in tmodel
        if isinstance(m, torch.nn.Linear)
    ]

    gen = mcpc.GenerativeModel(jmodel, key=0, params=params)
    jtr = mcpc.PCTrainer(
        gen,
        T=T,
        update_x_at="all",
        optimizer_x_fn="sgd",
        optimizer_x_kwargs={"lr": lr_x},
        update_p_at="last",
        accumulate_p_at=[mixing + i for i in range(sampling)],
        optimizer_p_fn="sgd",
        optimizer_p_kwargs={"lr": lr_p},
    )
    jtr.train_on_batch(
        jnp.zeros((B, 3)),
        loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={"_target": jnp.asarray(data_t.numpy()), "_var": var},
    )
    for (tw, tb), jp in zip(t_params, gen.params):
        np.testing.assert_allclose(np.asarray(jp["w"]), tw, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jp["b"]), tb, atol=1e-5)


def test_adam_x_parity():
    """Adam on latents (the PC warm-start optimizer) matches torch.optim.Adam
    stepwise."""
    ref_pc = _ref_modules()
    import torch.optim as optim

    tmodel, jmodel, params = _build_pair(seed=4)
    B, T, lr, var = 4, 10, 0.1, 1.0
    torch.manual_seed(5)
    data_t = torch.randn(B, 5)

    trainer = ref_pc.PCTrainer(
        tmodel,
        T=T,
        update_x_at="all",
        optimizer_x_fn=optim.Adam,
        optimizer_x_kwargs={"lr": lr},
        update_p_at="never",
        plot_progress_at=[],
    )

    def fe_t(output, _target, _var):
        return (1 / _var) * 0.5 * (output - _target).pow(2).sum()

    trainer.train_on_batch(
        inputs=torch.zeros(B, 3),
        loss_fn=fe_t,
        loss_fn_kwargs={"_target": data_t, "_var": var},
        is_log_progress=False,
        is_return_results_every_t=False,
        is_checking_after_callback_after_t=False,
    )
    xs_t = [x.detach().numpy() for x in trainer.get_model_xs()]

    gen = mcpc.GenerativeModel(jmodel, key=0, params=params)
    jtr = mcpc.PCTrainer(
        gen,
        T=T,
        optimizer_x_fn="adam",
        optimizer_x_kwargs={"lr": lr},
        update_p_at="never",
        optimizer_p_fn=None,
    )
    jtr.train_on_batch(
        jnp.zeros((B, 3)),
        loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={"_target": jnp.asarray(data_t.numpy()), "_var": var},
    )
    for xt, xj in zip(xs_t, gen.latents):
        np.testing.assert_allclose(np.asarray(xj), xt, atol=1e-4)


def test_dense_update_p_all_parity():
    """update_p_at='all' (the reference default) with in-scan parameter
    updates must match torch's per-step zero/backward/step sequence."""
    ref_pc = _ref_modules()
    import torch.optim as optim

    tmodel, jmodel, params = _build_pair(seed=6)
    B, T, lr_x, lr_p, var = 4, 8, 0.05, 0.05, 1.0
    torch.manual_seed(7)
    data_t = torch.randn(B, 5)

    trainer = ref_pc.PCTrainer(
        tmodel,
        T=T,
        update_x_at="all",
        optimizer_x_fn=optim.SGD,
        optimizer_x_kwargs={"lr": lr_x},
        update_p_at="all",
        optimizer_p_fn=optim.SGD,
        optimizer_p_kwargs={"lr": lr_p},
        plot_progress_at=[],
    )

    def fe_t(output, _target, _var):
        return (1 / _var) * 0.5 * (output - _target).pow(2).sum()

    trainer.train_on_batch(
        inputs=torch.zeros(B, 3),
        loss_fn=fe_t,
        loss_fn_kwargs={"_target": data_t, "_var": var},
        is_log_progress=False,
        is_return_results_every_t=False,
        is_checking_after_callback_after_t=False,
    )
    t_params = [
        (m.weight.detach().numpy().T, m.bias.detach().numpy())
        for m in tmodel
        if isinstance(m, torch.nn.Linear)
    ]

    gen = mcpc.GenerativeModel(jmodel, key=0, params=params)
    jtr = mcpc.PCTrainer(
        gen, T=T, update_x_at="all",
        optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": lr_x},
        update_p_at="all",
        optimizer_p_fn="sgd", optimizer_p_kwargs={"lr": lr_p},
    )
    # the dense plan must be ONE segment with in-scan updates
    assert len(jtr.plan.segments) == 1
    assert jtr.plan.segments[0].p_update_every_step
    jtr.train_on_batch(
        jnp.zeros((B, 3)),
        loss_fn=mcpc.fe_fn,
        loss_fn_kwargs={"_target": jnp.asarray(data_t.numpy()), "_var": var},
    )
    for (tw, tb), jp in zip(t_params, gen.params):
        np.testing.assert_allclose(np.asarray(jp["w"]), tw, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jp["b"]), tb, atol=1e-5)


@pytest.mark.parametrize("bernoulli", [False, True])
def test_masked_loss_trajectory_parity(bernoulli):
    """Masked sensory losses (reference utils/model.py:24-25,31-33 —
    image-completion posteriors / get_mse_rec): MAP trajectories must match
    the torch reference with the same trailing-window clamp."""
    ref_pc = _ref_modules()
    import torch.optim as optim

    tmodel, jmodel, params = _build_pair(seed=4)
    B, T, lr, var, perc = 4, 12, 0.05, 0.7, 0.4
    torch.manual_seed(5)
    if bernoulli:
        data_t = (torch.rand(B, 5) > 0.5).float()
    else:
        data_t = torch.randn(B, 5)
    inputs_t = torch.zeros(B, 3)

    # the reference masked losses, verbatim (utils/model.py:24-25,31-33)
    def fe_fn_mask_t(output, _target, _var, perc=0.5):
        k = round(output.shape[1] * perc)
        return (1 / _var) * 0.5 * (output[:, -k:] - _target[:, -k:]).pow(2).sum()

    def bernoulli_fn_mask_t(output, _target, _var=None, perc=0.5):
        k = round(output.shape[1] * perc)
        loss = torch.nn.BCEWithLogitsLoss(reduction="sum")
        return loss(output[:, -k:], _target[:, -k:])

    trainer = ref_pc.PCTrainer(
        tmodel, T=T, update_x_at="all",
        optimizer_x_fn=optim.SGD, optimizer_x_kwargs={"lr": lr},
        update_p_at="never", plot_progress_at=[],
    )
    res_t = trainer.train_on_batch(
        inputs=inputs_t,
        loss_fn=bernoulli_fn_mask_t if bernoulli else fe_fn_mask_t,
        loss_fn_kwargs={"_target": data_t, "_var": var, "perc": perc},
        is_log_progress=False,
        is_return_results_every_t=True,
        is_checking_after_callback_after_t=False,
    )
    xs_t = [x.detach().numpy() for x in trainer.get_model_xs()]

    gen = mcpc.GenerativeModel(jmodel, key=0, params=params)
    jtr = mcpc.PCTrainer(
        gen, T=T, update_x_at="all",
        optimizer_x_fn="sgd", optimizer_x_kwargs={"lr": lr},
        update_p_at="never", optimizer_p_fn=None,
    )
    res_j = jtr.train_on_batch(
        jnp.zeros((B, 3)),
        loss_fn=mcpc.bernoulli_fn_mask if bernoulli else mcpc.fe_fn_mask,
        loss_fn_kwargs={"_target": jnp.asarray(data_t.numpy()), "_var": var,
                        "perc": perc},
    )
    for xt, xj in zip(xs_t, gen.latents):
        np.testing.assert_allclose(np.asarray(xj), xt, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res_j["loss"]), np.asarray(res_t["loss"]), rtol=1e-4,
        atol=1e-6,
    )


def test_schedule_parser_differential_fuzz():
    """parse_schedule == the reference's _preprocess_step_index_list
    (pc_trainer.py:1068-1108) over every string spec and random index
    lists, for T = 1..20.  The reference returns lists in given order and
    only ever uses them for membership tests; ours normalizes to a sorted
    tuple — compare as sets.  Error behavior must agree too: unknown
    strings and out-of-range indices both raise."""
    import random

    ref_pc = _ref_modules()
    ref_parse = ref_pc.PCTrainer._preprocess_step_index_list

    rng = random.Random(0)
    schedule = __import__(
        "montecarlopredictivecoding_tpu.core.schedule", fromlist=["parse_schedule"]
    )
    for T in range(1, 21):
        for spec in ("all", "last", "last_half", "never"):
            ours = schedule.parse_schedule(spec, T)
            ref = ref_parse(None, indices=spec, T=T)
            assert sorted(ours) == sorted(ref), (spec, T, ours, ref)
        for _ in range(8):
            lst = [rng.randrange(T) for _ in range(rng.randrange(0, 2 * T))]
            ours = schedule.parse_schedule(list(lst), T)
            ref = ref_parse(None, indices=list(lst), T=T)
            assert set(ours) == set(ref), (lst, T)

    with pytest.raises(ValueError):
        schedule.parse_schedule("sometimes", 4)
    with pytest.raises(NotImplementedError):
        ref_parse(None, indices="sometimes", T=4)
    with pytest.raises(ValueError):
        schedule.parse_schedule([4], 4)
    with pytest.raises(AssertionError):
        ref_parse(None, indices=[4], T=4)
