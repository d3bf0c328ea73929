"""Ancestral sampling from a trained generative stack.

Reference ``sample_pc`` (``/root/reference/utils/training_evaluation.py:72-100``):
walk the stack from a zeros input; at each PC site draw ``x ~ N(mu, I)``;
at the sensory layer either return the pre-noise activations
(``is_return_hidden=True`` — logits for Bernoulli models) or sample
``N(mu, input_var*I)`` / ``Bernoulli(sigmoid(mu))``.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ..core.losses import bernoulli_fn, fe_fn
from ..core.trainer import GenerativeModel


def sample_pc(
    num_samples: int,
    gen: GenerativeModel,
    config: dict,
    key: tp.Optional[jax.Array] = None,
    is_return_hidden: bool = False,
):
    if key is None:
        key = gen.next_key()
    k_hidden, k_out = jax.random.split(key)
    hidden = gen.model.ancestral_sample(
        gen.params, k_hidden, num_samples, input_dim=config.get("input_size")
    )
    if is_return_hidden:
        return hidden

    loss_fn = config.get("loss_fn")
    if loss_fn is fe_fn or loss_fn == "fe_fn":
        std = float(config["input_var"]) ** 0.5
        return hidden + std * jax.random.normal(k_out, hidden.shape)
    if loss_fn is bernoulli_fn or loss_fn == "bernoulli_fn":
        probs = jax.nn.sigmoid(hidden)
        return (jax.random.uniform(k_out, probs.shape) <= probs).astype(
            jnp.float32
        )
    return hidden
