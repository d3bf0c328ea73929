"""Shared experiment plumbing: seeds, paths, scaling, checkpoint loading.

The reference drivers fix ``random.seed(1); np.random.seed(2);
torch.manual_seed(30)`` per script (e.g. figure_2.py:24-26); here a single
PRNG key stream plays that role.  ``scale`` lets every experiment run at a
fraction of the reference step counts for smoke testing (``--full`` restores
reference scale).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import typing as tp
import zlib

import jax
import numpy as np


@dataclasses.dataclass
class ExperimentContext:
    path_models: str
    path_figures: str
    scale: float = 1.0  # multiplier on inference-step counts
    seed: int = 30
    reference_models: str = "/root/reference/models"

    def key(self, fold: int = 0):
        return jax.random.fold_in(jax.random.PRNGKey(self.seed), fold)

    def steps(self, n: int, minimum: int = 2) -> int:
        """Scale a reference step count."""
        return max(int(round(n * self.scale)), minimum)

    def fig_path(self, name: str) -> str:
        os.makedirs(self.path_figures, exist_ok=True)
        return os.path.join(self.path_figures, name)


def standard_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--models", default="models", help="checkpoint directory")
    p.add_argument("--figures", default="figures", help="figure output directory")
    p.add_argument(
        "--scale",
        type=float,
        default=0.05,
        help="fraction of the reference inference-step counts (1.0 = full)",
    )
    p.add_argument("--full", action="store_true", help="reference-scale run")
    p.add_argument("--seed", type=int, default=30)
    return p


def context_from_args(args) -> ExperimentContext:
    return ExperimentContext(
        path_models=args.models,
        path_figures=args.figures,
        scale=1.0 if args.full else args.scale,
        seed=args.seed,
    )


def load_generative_checkpoint(ctx: ExperimentContext, name: str, config: dict):
    """Load a generative-MLP checkpoint by name.

    Search order: native checkpoints under ``ctx.path_models``; the
    reference's torch checkpoints (via the import shim); finally a freshly
    initialized model (with a warning) so experiments stay runnable without
    assets.
    """
    import warnings

    import montecarlopredictivecoding_tpu as mcpc
    from ..models.factory import get_model
    from ..utils.checkpoint import load_checkpoint, load_torch_state_dict

    gen = get_model(config, key=ctx.key(zlib.crc32(name.encode()) % 1000))
    native = os.path.join(ctx.path_models, name + ".msgpack")
    if os.path.isfile(native):
        gen.params = load_checkpoint(native, gen.params)
        return gen
    ref = os.path.join(ctx.reference_models, name)
    if os.path.isfile(ref):
        gen.params = load_torch_state_dict(ref, gen.model)
        return gen
    warnings.warn(
        f"checkpoint {name!r} not found in {ctx.path_models} or "
        f"{ctx.reference_models}; using random initialization. Train one with "
        "experiments/train_mnist.py.",
        RuntimeWarning,
    )
    return gen
