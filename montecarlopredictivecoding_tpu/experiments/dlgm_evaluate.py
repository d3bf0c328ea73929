"""Standalone DLGM evaluation CLI — importance-sampled −ln p(v)
(reference ``/root/reference/Deep_Latent_Gaussian_Models/evaluate.py``):
replicate each datum ``particle_size`` times, draw posterior particles from
the recognition model, logsumexp the importance weights.

Usage:
    python -m montecarlopredictivecoding_tpu.experiments.dlgm_evaluate \
        --checkpoint models/dlgm_ml_1.msgpack --particle-size 16
    python -m ...dlgm_evaluate --checkpoint /root/reference/models/dlgm_ml_1 \
        --torch --particle-size 16
"""

from __future__ import annotations

import argparse

import montecarlopredictivecoding_tpu as mcpc
from ..data import get_mnist_data
from ..models.dlgm import DLGM
from ..utils.checkpoint import load_checkpoint, load_torch_dlgm


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--torch", action="store_true",
                   help="checkpoint is a reference torch state dict")
    p.add_argument("--particle-size", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--n-batches", type=int, default=None)
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--latent-dim", type=int, default=20)
    args = p.parse_args()

    dlgm = DLGM(784, args.hidden_dim, args.latent_dim, factor_recog=1, key=0)
    if args.torch:
        dlgm.gen_params, dlgm.rec_params = load_torch_dlgm(args.checkpoint)
        if "fc3" in dlgm.gen_params:
            # simple reference topology (the shipped checkpoint): one latent
            # level, factor class inferred from the cov head width
            from ..models.cholesky import factor_from_free_size

            latent = int(dlgm.gen_params["fc3"]["w"].shape[0])
            dlgm.latent_dim_list = [latent]
            dlgm.factors = [
                factor_from_free_size(
                    latent, int(dlgm.rec_params["nets"][0]["cov"]["w"].shape[1])
                )
            ]
    else:
        dlgm.gen_params, dlgm.rec_params = load_checkpoint(
            args.checkpoint, (dlgm.gen_params, dlgm.rec_params)
        )

    config = {
        "loss_fn": mcpc.bernoulli_fn,
        "batch_size_train": args.batch_size,
        "batch_size_val": args.batch_size,
        "batch_size_test": args.batch_size,
    }
    _, val_loader, _ = get_mnist_data(config)
    batches = []
    for i, b in enumerate(val_loader):
        if args.n_batches is not None and i >= args.n_batches:
            break
        batches.append(b)
    nll = dlgm.evaluate_importance_nll(batches, particle_size=args.particle_size)
    print(f"-ln p(v) = {nll:.4f} nats/datum ({args.particle_size} particles)")


if __name__ == "__main__":
    main()
