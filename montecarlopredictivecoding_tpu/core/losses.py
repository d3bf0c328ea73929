"""Sensory-layer losses (the bottom-layer clamp of the generative stack).

JAX re-expressions of the reference sensory losses
(``/root/reference/utils/model.py:17-33``).  All reductions are sums over the
whole batch — the trainer divides parameter gradients by the batch size (and
the accumulation-window length) to recover mean-per-datapoint updates,
mirroring reference ``pc_trainer.py:904-913``.

Each loss has signature ``loss(output, _target=..., _var=...) -> scalar`` so
`loss_fn_kwargs` dicts from reference configs carry over verbatim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically stable elementwise BCE-with-logits (torch-equivalent):

    ``max(z,0) - z*y + log(1 + exp(-|z|))``
    """
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def fe_fn(output: Array, _target: Array, _var: float) -> Array:
    """Gaussian sensory energy: ``(1/var)*0.5*sum((output-target)^2)``
    (reference utils/model.py:17-18)."""
    return (1.0 / _var) * 0.5 * jnp.sum((output - _target) ** 2)


def bernoulli_fn(output: Array, _target: Array, _var=None, _reduction: str = "sum") -> Array:
    """Bernoulli sensory energy: summed BCE-with-logits
    (reference utils/model.py:20-22)."""
    e = _bce_with_logits(output, _target)
    if _reduction == "sum":
        return jnp.sum(e)
    if _reduction == "none":
        return e
    if _reduction == "mean":
        return jnp.mean(e)
    raise ValueError(f"unknown reduction {_reduction!r}")


def fe_fn_mask(output: Array, _target: Array, _var: float, perc: float = 0.5) -> Array:
    """Gaussian loss clamping only the last ``round(D*perc)`` features —
    image-completion posteriors (reference utils/model.py:24-25)."""
    k = round(output.shape[1] * perc)
    return (1.0 / _var) * 0.5 * jnp.sum((output[:, -k:] - _target[:, -k:]) ** 2)


def bernoulli_fn_mask(output: Array, _target: Array, _var=None, perc: float = 0.5) -> Array:
    """Bernoulli loss on the last ``round(D*perc)`` features
    (reference utils/model.py:31-33)."""
    k = round(output.shape[1] * perc)
    return jnp.sum(_bce_with_logits(output[:, -k:], _target[:, -k:]))


def zero_fn(output: Array, *args, **kwargs) -> Array:
    """Unclamped sensory layer — used for generative/spontaneous sampling
    (reference utils/model.py:27-28)."""
    return jnp.zeros((), dtype=output.dtype)
