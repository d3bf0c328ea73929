"""End-to-end evaluation of in-framework-trained checkpoints — the Table-1
procedure (reference table_1.py) run on models this framework trained itself.

Writes EVAL_r1.md at the repo root with FID (ResNet-9 features + raw pixels),
masked-reconstruction MSE and marginal likelihood for {MCPC, PC, DLGM}.

Run: python benchmarks/eval_trained.py  (TPU or CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.data import get_mnist_data
from montecarlopredictivecoding_tpu.eval.fid import get_fid, make_resnet9_features, pixel_features
from montecarlopredictivecoding_tpu.eval.metrics import get_marginal_likelihood, get_mse_rec
from montecarlopredictivecoding_tpu.experiments.common import ExperimentContext, load_generative_checkpoint
from montecarlopredictivecoding_tpu.experiments.table_1 import _config_mcpc, _config_pc, _load_dlgm
from montecarlopredictivecoding_tpu.models.resnet9 import ResNet9State, init_resnet9


def load_resnet9_features(path="models/resnet9.msgpack"):
    from flax import serialization

    model, tx, state = init_resnet9(jax.random.PRNGKey(0))
    with open(path, "rb") as f:
        restored = serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats}, f.read()
        )
    state = ResNet9State(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=state.opt_state,
    )
    return make_resnet9_features(state)


def main():
    ctx = ExperimentContext(path_models="models", path_figures="figures", scale=1.0)
    n_samples = 5000

    feats = {}
    feats["pixel"] = pixel_features
    if os.path.isfile("models/resnet9.msgpack"):
        feats["resnet9"] = load_resnet9_features()

    cfg_m = _config_mcpc(ctx)
    cfg_p = _config_pc(ctx)
    gen_m = load_generative_checkpoint(ctx, "mcpc_fid_1", cfg_m)
    gen_p = load_generative_checkpoint(ctx, "pc_fid_1", cfg_p)
    dlgm = _load_dlgm(ctx, "dlgm_fid_1")

    lines = [
        "# EVAL_r1 — in-framework-trained checkpoints, Table-1 procedure",
        "",
        "Models trained by experiments/train_mnist.py (10 epochs, synthetic-",
        "MNIST fallback data in this environment; the procedure is identical",
        "for real MNIST IDX files). Metrics per reference table_1.py.",
        "",
    ]

    for tag, fn in feats.items():
        fid_m = get_fid(gen_m, cfg_m, n_samples=n_samples, is_test=True, feature_fn=fn, key=ctx.key(1))
        fid_p = get_fid(gen_p, cfg_p, n_samples=n_samples, is_test=True, feature_fn=fn, key=ctx.key(2))
        fid_d = dlgm.get_fid(n_samples, is_test=True, feature_fn=fn)
        lines.append(f"## FID ({tag} features, {n_samples} samples, test split)")
        lines.append("")
        lines.append(f"- MCPC: {fid_m:.3f}")
        lines.append(f"- PC:   {fid_p:.3f}")
        lines.append(f"- DLGM: {fid_d:.3f}")
        lines.append("")
        print(lines[-4], lines[-3], lines[-2])

    _, _, test_loader = get_mnist_data(cfg_p)
    batches = [b for i, b in enumerate(test_loader) if i < 1]
    mse_m = get_mse_rec(gen_m, cfg_m, batches)
    mse_p = get_mse_rec(gen_p, cfg_p, batches)
    mse_d = dlgm.get_mse_rec(batches)
    lines += ["## Masked-reconstruction MSE (1024 test images)", "",
              f"- MCPC: {mse_m:.5f}", f"- PC:   {mse_p:.5f}", f"- DLGM: {mse_d:.5f}", ""]
    print("MSE", mse_m, mse_p, mse_d)

    _, val_loader, _ = get_mnist_data(cfg_p)
    vb = [b for i, b in enumerate(val_loader) if i < 2]
    ml_m = get_marginal_likelihood(gen_m, cfg_m, vb, n_samples=n_samples, key=ctx.key(3))
    ml_p = get_marginal_likelihood(gen_p, cfg_p, vb, n_samples=n_samples, key=ctx.key(4))
    ml_d = dlgm.get_marginal_likelihood(vb, n_samples=n_samples)
    lines += ["## Marginal likelihood (nats, 2048 val images, 5000 MC samples)", "",
              f"- MCPC: {ml_m:.2f}", f"- PC:   {ml_p:.2f}", f"- DLGM: {ml_d:.2f}", ""]
    print("ML", ml_m, ml_p, ml_d)

    with open("EVAL_r1.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote EVAL_r1.md")


if __name__ == "__main__":
    main()
