"""Device-mesh helpers.

The reference is single-device (one optional ``.cuda()``,
``/root/reference/utils/model.py:67-68``); its only parallel axes are the
batch dimension (= Langevin chains) and a sequential Python seed loop
(``figure_5.py:72-144``).  Here those axes become mesh dimensions:

* ``data``  — datapoints / Monte-Carlo chains (pure data parallel; the
  Monte-Carlo weight-gradient ``psum`` rides ICI at the single per-batch
  parameter update, reference ``pc_trainer.py:904-914``);
* ``model`` — feature dimension of wide layers (tensor parallel for the
  784-wide sensory layer and beyond).
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    devices: tp.Optional[tp.Sequence] = None,
    data: tp.Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a ``(data, model)`` mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def best_mesh_shape(n: int, feature_dims: tp.Sequence[int]) -> tp.Tuple[int, int]:
    """Pick (data, model) for n devices: the largest model-axis size that
    divides every shardable feature dim (so tensor parallelism applies to the
    whole stack), capped at 4 — beyond that the small MCPC layers (20-128
    wide) fragment below MXU tile size and TP stops paying for its
    collectives."""
    best_model = 1
    for m in (2, 4):
        if n % m == 0 and all(d % m == 0 for d in feature_dims):
            best_model = m
    return n // best_model, best_model
