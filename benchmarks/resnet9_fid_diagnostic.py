"""Root-cause diagnostic for the ResNet-9-FID ordering flip on the
reference's checkpoints (REF_EVAL.md: reference PC scores 57 vs MCPC 170
under resnet9 features, while pixel FID and the paper say MCPC wins).

Hypothesis: the in-framework ResNet-9 was trained on THIS environment's
(synthetic-fallback) MNIST; samples from the reference's real-MNIST-trained
checkpoints are out-of-domain for it, and FID over an out-of-domain feature
map is not a trustworthy ranking basis.  This script quantifies the domain
gap: classifier confidence/entropy and feature geometry of (a) test digits,
(b) reference-checkpoint samples, (c) in-framework-checkpoint samples.

Run: JAX_PLATFORMS=cpu python benchmarks/resnet9_fid_diagnostic.py
Prints a markdown block for REF_EVAL.md.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/jax_tpu_cache" if jax.default_backend() == "tpu" else "/tmp/jax_test_cache",
)

import jax.numpy as jnp
import numpy as np

from montecarlopredictivecoding_tpu.data.mnist import load_mnist_arrays
from montecarlopredictivecoding_tpu.eval.fid import generated_images
from montecarlopredictivecoding_tpu.experiments.common import (
    ExperimentContext,
    load_generative_checkpoint,
)
from montecarlopredictivecoding_tpu.experiments.table_1 import (
    _config_mcpc,
    _config_pc,
)

N = 2000


def main():
    from benchmarks.eval_trained import load_resnet9_features

    feat_fn = load_resnet9_features()
    from flax import serialization  # noqa: F401

    from montecarlopredictivecoding_tpu.models.resnet9 import (
        ResNet9State,
        init_resnet9,
    )

    model, tx, state = init_resnet9(jax.random.PRNGKey(0))
    with open("models/resnet9.msgpack", "rb") as f:
        restored = serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats},
            f.read(),
        )
    state = ResNet9State(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=state.opt_state,
    )
    from montecarlopredictivecoding_tpu.models.resnet9 import make_eval_fn

    logits_fn = make_eval_fn(model)

    _, (te_x, _) = load_mnist_arrays("MNIST_data", True)

    sources = {"test digits": np.asarray(te_x[:N])}
    ref_ctx = ExperimentContext(
        path_models="/nonexistent__force_reference", path_figures="figures"
    )
    our_ctx = ExperimentContext(path_models="models", path_figures="figures")
    for label, ctx in (("reference", ref_ctx), ("in-framework", our_ctx)):
        for fam, cfg_fn in (("mcpc", _config_mcpc), ("pc", _config_pc)):
            cfg = cfg_fn(ctx)
            gen = load_generative_checkpoint(ctx, f"{fam}_fid_1", cfg)
            sources[f"{label} {fam}_fid_1 samples"] = generated_images(
                gen, cfg, N, key=jax.random.PRNGKey(7)
            )

    print("| sample set | mean max-prob | mean entropy (nats) | mean feature L2 |")
    print("|---|---|---|---|")
    for label, imgs in sources.items():
        x = jnp.asarray(np.asarray(imgs, np.float32).reshape(-1, 28, 28, 1))
        logits = []
        for s in range(0, len(x), 500):
            logits.append(np.asarray(logits_fn(state, x[s : s + 500])))
        logits = np.concatenate(logits)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ent = float(
            (-(p * np.log(p + 1e-12)).sum(-1)).mean()
        )
        feats = feat_fn(np.asarray(imgs))
        norm = float(np.linalg.norm(feats, axis=1).mean())
        print(f"| {label} | {p.max(-1).mean():.3f} | {ent:.3f} | {norm:.1f} |")


if __name__ == "__main__":
    main()
