"""ResNet-9 ideal-observer classifier (reference ``/root/reference/ResNet9.py``).

Topology parity: conv_block = Conv3x3(pad 1) -> BatchNorm -> Mish
(+ optional 2x2 max-pool); two residual additions; final 2x2 max-pool,
flatten, linear head.  ``is_mask=True`` is the half-image variant (no pool in
conv4, 768-wide head) used for masked-digit class posteriors
(reference ResNet9.py:36,41, figure_2.py:401-403).

The reference repo ships no training script for this model
(``models/resnet9`` is loaded but absent — SURVEY.md §2.3); ``train_resnet9``
below supplies that missing producer.

NHWC layout + bfloat16-friendly conv sizes for the MXU.
"""

from __future__ import annotations

import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class ConvBlock(nn.Module):
    features: int
    pool: bool = False
    pool_no: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = mish(x)
        if self.pool:
            x = nn.max_pool(
                x,
                (self.pool_no, self.pool_no),
                strides=(self.pool_no, self.pool_no),
            )
        return x


class ResNet9(nn.Module):
    num_classes: int = 10
    is_mask: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        # x: [B, H, W, C]
        x = ConvBlock(64)(x, train)
        x = ConvBlock(128, pool=True)(x, train)
        r = ConvBlock(128)(x, train)
        r = ConvBlock(128)(r, train)
        x = r + x
        x = ConvBlock(256, pool=True)(x, train)
        x = ConvBlock(256, pool=not self.is_mask)(x, train)
        r = ConvBlock(256)(x, train)
        r = ConvBlock(256)(r, train)
        x = r + x
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        feats = x.reshape((x.shape[0], -1))
        logits = nn.Dense(self.num_classes)(feats)
        if return_features:
            return logits, feats
        return logits


class ResNet9State(tp.NamedTuple):
    params: tp.Any
    batch_stats: tp.Any
    opt_state: tp.Any


def init_resnet9(
    key, is_mask: bool = False, lr: float = 1e-3, input_hw=None
):
    """``input_hw=None`` picks the MNIST shape the variant actually
    consumes: full 28x28, or the bottom-half 14x28 crop for ``is_mask``
    (the reference feeds `xb[:, :, 14:, :]`-style half images to the
    768-head masked model, ResNet9.py:41 / figure_2.py:401-403) — an
    explicit mismatch used to leave the Dense head inited at 2304 wide
    and crash the first masked train step."""
    if input_hw is None:
        input_hw = (14, 28) if is_mask else (28, 28)
    model = ResNet9(is_mask=is_mask)
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 1))
    variables = model.init(key, dummy, train=False)
    tx = optax.adam(lr)
    state = ResNet9State(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return model, tx, state


def make_train_step(model: ResNet9, tx):
    @jax.jit
    def step(state: ResNet9State, images, labels):
        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return ResNet9State(params, bs, opt_state), loss, acc

    return step


def make_eval_fn(model: ResNet9):
    @jax.jit
    def logits_fn(state: ResNet9State, images):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )

    return logits_fn


def make_feature_fn(model: ResNet9):
    """Penultimate-layer features — the FID feature extractor named in the
    rebuild's north star (BASELINE.json)."""

    @jax.jit
    def feats_fn(state: ResNet9State, images):
        _, feats = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
            return_features=True,
        )
        return feats

    return feats_fn


def train_resnet9(
    train_batches,
    key=None,
    epochs: int = 1,
    is_mask: bool = False,
    lr: float = 1e-3,
    log_every: int = 0,
):
    """Train the ideal observer on MNIST batches of ([B, 784], labels).

    The missing upstream producer for ``models/resnet9``
    (reference figure_2.py:401-403 loads it but nothing creates it).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    model, tx, state = init_resnet9(key, is_mask=is_mask, lr=lr)
    step = make_train_step(model, tx)
    for _ in range(epochs):
        for i, (images, labels) in enumerate(train_batches):
            x = images.reshape(-1, 28, 28, 1)
            if is_mask:
                x = x[:, 14:, :, :]  # bottom half only
            state, loss, acc = step(state, x, labels)
            if log_every and i % log_every == 0:
                print(f"step {i}: loss={float(loss):.4f} acc={float(acc):.3f}")
    return model, state
