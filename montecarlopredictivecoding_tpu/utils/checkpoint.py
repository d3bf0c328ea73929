"""Checkpointing: native pytree checkpoints + a torch state-dict import shim.

The reference persists models as ``torch.save(state_dict)`` files with keys
``"<module_idx>.weight" / ".bias"`` plus stale ``"<idx>._x"`` latents, always
loaded ``strict=False`` (e.g. ``/root/reference/figure_2.py:184``,
``table_1.py:76``; key layout verified in SURVEY.md §2.3 row 24).  The shim
maps those onto our params pytree (transposing torch's [out, in] weights to
the [in, out] layout our matmuls use) so the 28 shipped checkpoints can be
loaded for parity evaluation.

Native checkpoints are flax msgpack bytes (works for any params/latents/opt
pytree, no pickle).
"""

from __future__ import annotations

import os
import re
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import PCModel


def save_checkpoint(path: str, pytree) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, pytree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def load_checkpoint(path: str, like) -> tp.Any:
    """Load a checkpoint saved by :func:`save_checkpoint`; ``like`` is a
    pytree with the target structure (e.g. ``model.init(key)``)."""
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(like, data)


def torch_state_dict_to_params(
    state_dict: tp.Mapping[str, tp.Any],
    model: tp.Optional[PCModel] = None,
) -> tuple:
    """Convert a reference-style Sequential state dict to our params tuple.

    Keys ``"<i>.weight"`` are gathered in ascending module index; stale
    ``"<i>._x"`` latent entries are ignored (the reference loads with
    ``strict=False`` for the same reason).
    """
    weights: dict[int, np.ndarray] = {}
    biases: dict[int, np.ndarray] = {}
    for k, v in state_dict.items():
        m = re.fullmatch(r"(\d+)\.(weight|bias)", k)
        if not m:
            continue  # e.g. "1._x" stale latents
        idx = int(m.group(1))
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if m.group(2) == "weight":
            weights[idx] = arr
        else:
            biases[idx] = arr

    params = []
    for idx in sorted(weights):
        p = {"w": jnp.asarray(weights[idx].T)}  # torch [out,in] -> ours [in,out]
        if idx in biases:
            p["b"] = jnp.asarray(biases[idx])
        params.append(p)

    if model is not None:
        expected = [
            (model.modules[i].in_dim, model.modules[i].out_dim)
            for i in model.linear_indices
        ]
        got = [tuple(p["w"].shape) for p in params]
        if expected != got:
            raise ValueError(
                f"checkpoint shapes {got} do not match model Linears {expected}"
            )
    return tuple(params)


def load_torch_state_dict(path: str, model: tp.Optional[PCModel] = None) -> tuple:
    """Load a reference torch checkpoint file into a params tuple."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_params(sd, model)
