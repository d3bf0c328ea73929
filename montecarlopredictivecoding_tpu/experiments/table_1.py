"""Table 1 — quantitative model comparison (reference ``/root/reference/table_1.py``):
FID / masked-reconstruction MSE / marginal likelihood over 3 seeds x
{MCPC, PC, DLGM}, printing mean ± std per model family.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from ..data import get_mnist_data
from ..eval.fid import get_fid, pixel_features
from ..eval.metrics import get_marginal_likelihood, get_mse_rec
from ..models.dlgm import DLGM
from ..utils.checkpoint import load_checkpoint
from .common import ExperimentContext, context_from_args, load_generative_checkpoint, standard_parser


def _config_mcpc(ctx, input_size=20, hidden=128):
    return {
        "batch_size_train": 256, "batch_size_val": 1024, "batch_size_test": 1024,
        "input_size": input_size, "hidden_size": hidden, "hidden2_size": hidden,
        "output_size": 784, "loss_fn": mcpc.bernoulli_fn, "activation_fn": "relu",
        "input_var": None,
        "T_pc": ctx.steps(250), "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.7},
        "mixing": ctx.steps(50), "sampling": ctx.steps(100),
        "optimizer_x_kwargs_mcpc": {"lr": 0.1},
    }


def _config_pc(ctx, input_size=20, hidden=128, activation="relu", lr=0.1):
    return {
        "batch_size_train": 128, "batch_size_val": 1024, "batch_size_test": 1024,
        "input_size": input_size, "hidden_size": hidden, "hidden2_size": hidden,
        "output_size": 784, "loss_fn": mcpc.bernoulli_fn, "activation_fn": activation,
        "input_var": None,
        "T_pc": ctx.steps(250), "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": lr},
    }


def _load_dlgm(ctx, name, hidden=256, latent=20):
    """Native msgpack first, then the reference's torch state dict via the
    import shim (the same search order as load_generative_checkpoint)."""
    dlgm = DLGM(
        784, hidden, latent, factor_recog=1,
        key=ctx.key(zlib.crc32(name.encode()) % 997),
    )
    path = os.path.join(ctx.path_models, name + ".msgpack")
    if os.path.isfile(path):
        dlgm.gen_params, dlgm.rec_params = load_checkpoint(
            path, (dlgm.gen_params, dlgm.rec_params)
        )
        return dlgm
    ref = os.path.join(ctx.reference_models, name)
    if os.path.isfile(ref):
        from ..utils.checkpoint import load_torch_dlgm

        dlgm.gen_params, dlgm.rec_params = load_torch_dlgm(ref)
    return dlgm


def _report(name, table):
    for col, model in enumerate(["MCPC", "PC", "DLGM"]):
        print(f"{name} {model}: {table[:, col].mean():.4f} +/- {table[:, col].std():.4f}")


def get_models_fids(ctx: ExperimentContext, seeds=(1, 2, 3), n_samples=5000,
                    feature_fn=None):
    """Reference table_1.py:17-95."""
    if feature_fn is None:
        feature_fn = pixel_features
    fids = np.zeros((len(seeds), 3))
    for i, s in enumerate(seeds):
        cfg_m = _config_mcpc(ctx)
        cfg_p = _config_pc(ctx)
        gen_m = load_generative_checkpoint(ctx, f"mcpc_fid_{s}", cfg_m)
        gen_p = load_generative_checkpoint(ctx, f"pc_fid_{s}", cfg_p)
        dlgm = _load_dlgm(ctx, f"dlgm_fid_{s}")
        fids[i, 0] = get_fid(gen_m, cfg_m, n_samples=n_samples, is_test=True,
                             feature_fn=feature_fn, key=ctx.key(300 + s))
        fids[i, 1] = get_fid(gen_p, cfg_p, n_samples=n_samples, is_test=True,
                             feature_fn=feature_fn, key=ctx.key(310 + s))
        fids[i, 2] = dlgm.get_fid(n_samples, is_test=True, feature_fn=feature_fn)
    _report("FID", fids)
    return fids


def get_models_mse(ctx: ExperimentContext, seeds=(1, 2, 3), n_batches=None):
    """Reference table_1.py:97-177 (exact per-metric configs: MCPC
    10-256-256 relu with mcpc-lr 0.03, PC 30-256-256 tanh with pc-lr 0.7,
    full test set)."""
    mses = np.zeros((len(seeds), 3))
    for i, s in enumerate(seeds):
        cfg_m = _config_mcpc(ctx, input_size=10, hidden=256)
        cfg_m["optimizer_x_kwargs_mcpc"] = {"lr": 0.03}
        cfg_p = _config_pc(ctx, input_size=30, hidden=256, activation="tanh", lr=0.7)
        cfg_m["input_var"], cfg_p["input_var"] = None, None
        gen_m = load_generative_checkpoint(ctx, f"mcpc_mse_{s}", cfg_m)
        gen_p = load_generative_checkpoint(ctx, f"pc_mse_{s}", cfg_p)
        dlgm = _load_dlgm(ctx, f"dlgm_mse_{s}")
        _, _, test_loader = get_mnist_data(cfg_p)
        batches = [
            b for bi, b in enumerate(test_loader)
            if n_batches is None or bi < n_batches
        ]
        mses[i, 0] = get_mse_rec(gen_m, cfg_m, batches)
        mses[i, 1] = get_mse_rec(gen_p, cfg_p, batches)
        mses[i, 2] = dlgm.get_mse_rec(batches)
    _report("MSE", mses)
    return mses


def get_models_ml(ctx: ExperimentContext, seeds=(1, 2, 3), n_samples=5000,
                  n_batches=None):
    """Reference table_1.py:179-259 (exact per-metric configs: MCPC
    20-128-128 relu with mcpc-lr 0.03, PC 25-128-128 tanh with pc-lr 0.3,
    DLGM hidden 128 / latent 10, full validation set)."""
    mls = np.zeros((len(seeds), 3))
    for i, s in enumerate(seeds):
        cfg_m = _config_mcpc(ctx)
        cfg_m["optimizer_x_kwargs_mcpc"] = {"lr": 0.03}
        cfg_p = _config_pc(ctx, input_size=25, activation="tanh", lr=0.3)
        gen_m = load_generative_checkpoint(ctx, f"mcpc_ml_{s}", cfg_m)
        gen_p = load_generative_checkpoint(ctx, f"pc_ml_{s}", cfg_p)
        dlgm = _load_dlgm(ctx, f"dlgm_ml_{s}", hidden=128, latent=10)
        _, val_loader, _ = get_mnist_data(cfg_p)
        batches = [
            b for bi, b in enumerate(val_loader)
            if n_batches is None or bi < n_batches
        ]
        mls[i, 0] = get_marginal_likelihood(gen_m, cfg_m, batches, n_samples=n_samples,
                                            key=ctx.key(400 + s))
        mls[i, 1] = get_marginal_likelihood(gen_p, cfg_p, batches, n_samples=n_samples,
                                            key=ctx.key(410 + s))
        mls[i, 2] = dlgm.get_marginal_likelihood(batches, n_samples=n_samples)
    _report("marginal likelihood", mls)
    return mls


if __name__ == "__main__":
    p = standard_parser(__doc__)
    p.add_argument("--n-samples", type=int, default=None)
    args = p.parse_args()
    ctx = context_from_args(args)
    n = args.n_samples or (5000 if args.full else 500)
    get_models_fids(ctx, n_samples=n)
    get_models_mse(ctx)
    get_models_ml(ctx, n_samples=n)
