"""Module specs for predictive-coding stacks.

A model is a static sequence of module specs (:class:`Linear`,
:class:`Activation`, :class:`PC`).  Unlike the reference implementation
(``/root/reference/predictive_coding/pc_layer.py``), which stores latent value
nodes as mutable ``nn.Parameter`` state inside ``PCLayer`` modules, the specs
here are pure descriptions: parameters and latents live in explicit pytrees
threaded through jitted functions.  This is the TPU-native re-expression of
the same layer contract:

* ``PC`` captures the incoming prediction ``mu``, contributes the layer energy
  ``energy_fn({'mu': mu, 'x': x})`` (default ``0.5*(mu-x)**2``, summed), and
  forwards ``x`` instead of ``mu`` in train mode (reference
  ``pc_layer.py:295,300``).  In eval mode it is the identity
  (``pc_layer.py:302-304``).
* ``S`` mask: interactive all-to-all energy between expanded ``mu``/``x``
  (reference ``pc_layer.py:237-276``); ``M`` mask: elementwise energy
  selection (``pc_layer.py:278-281``).  ``S`` overrides ``M``.
* ``sample_x_fn`` variants mirror ``utils/model.py:8-15`` with an explicit
  PRNG key instead of in-place torch RNG.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# Energy functions (elementwise, reduced by the model).
# Signature mirrors the reference energy_fn contract: a dict with 'mu' and 'x'
# (plus any additional inputs) -> elementwise energy tensor.
# ---------------------------------------------------------------------------


def gaussian_energy(inputs: dict) -> Array:
    """Default PC energy: ``0.5 * (mu - x)**2`` (reference pc_layer.py:17-18)."""
    return 0.5 * (inputs["mu"] - inputs["x"]) ** 2


gaussian_energy.gaussian_var = 1.0


def scaled_gaussian_energy(var: float) -> tp.Callable[[dict], Array]:
    """Gaussian energy with variance ``var``: ``(1/var)*0.5*(mu-x)**2``.

    Used for the "generative PCLayer at the output" pattern
    (reference figure_3.py:47-55, figure_6.py:80-84).
    """

    def _fn(inputs: dict) -> Array:
        return (1.0 / var) * 0.5 * (inputs["mu"] - inputs["x"]) ** 2

    # introspection hook: lets the fused kernel's eligibility check read the
    # variance off an output-PC site (ops/pallas_mcpc.py::supports_model)
    _fn.gaussian_var = float(var)
    return _fn


# ---------------------------------------------------------------------------
# Latent initialisers (sample_x_fn variants).  ``inputs`` carries 'mu', 'x'
# (previous latent or None) and 'key' (PRNG key; None for deterministic fns).
# ---------------------------------------------------------------------------


def forward_init(inputs: dict) -> Array:
    """Default: feed-forward init ``x = mu`` (reference pc_layer.py:19-20)."""
    return inputs["mu"]


def uniform_init(inputs: dict) -> Array:
    """Uniform init on [-10, 10] (reference utils/model.py:8-9)."""
    return jax.random.uniform(
        inputs["key"], inputs["mu"].shape, inputs["mu"].dtype, -10.0, 10.0
    )


def normal_init(inputs: dict) -> Array:
    """Standard-normal init (reference utils/model.py:11-12)."""
    return jax.random.normal(inputs["key"], inputs["mu"].shape, inputs["mu"].dtype)


def constant_init(inputs: dict) -> Array:
    """Constant-3 init (reference utils/model.py:14-15)."""
    return 3.0 * jnp.ones_like(inputs["mu"])


# Aliases matching the reference names.
sample_x_fn = uniform_init
sample_x_fn_normal = normal_init
sample_x_fn_cte = constant_init


# ---------------------------------------------------------------------------
# Module specs.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Linear:
    """Dense layer ``y = x @ w + b``; params are an explicit pytree leaf pair.

    Initialisation matches ``torch.nn.Linear`` (uniform ±1/sqrt(in_dim)) so
    that learning-dynamics comparisons with the reference start from the same
    distribution.
    """

    in_dim: int
    out_dim: int
    use_bias: bool = True

    def init(self, key: Array, dtype=jnp.float32) -> dict:
        kw, kb = jax.random.split(key)
        bound = 1.0 / (self.in_dim ** 0.5)
        params = {
            "w": jax.random.uniform(
                kw, (self.in_dim, self.out_dim), dtype, -bound, bound
            )
        }
        if self.use_bias:
            params["b"] = jax.random.uniform(
                kb, (self.out_dim,), dtype, -bound, bound
            )
        return params

    def apply(self, params: dict, x: Array) -> Array:
        y = x @ params["w"]
        if self.use_bias:
            y = y + params["b"]
        return y


_ACTIVATIONS: dict[str, tp.Callable[[Array], Array]] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
    "gelu": jax.nn.gelu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


def activation_fn(name: str) -> tp.Callable[[Array], Array]:
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}"
        ) from None


@dataclasses.dataclass(frozen=True)
class Activation:
    name: str

    def apply(self, x: Array) -> Array:
        return activation_fn(self.name)(x)


@dataclasses.dataclass(frozen=True)
class PC:
    """Predictive-coding latent site.

    Attributes:
        energy_fn: elementwise energy of (mu, x); default Gaussian.
        sample_x_fn: latent initialiser given the incoming prediction.
        S: optional [size_mu, size_x] interactive-energy mask (reference
            pc_layer.py:237-276).  Overrides M.
        M: optional elementwise energy-selection mask (pc_layer.py:278-281).
        is_holding_error: store ``x - mu`` during forward (pc_layer.py:297-298).
    """

    energy_fn: tp.Callable[[dict], Array] = gaussian_energy
    sample_x_fn: tp.Callable[[dict], Array] = forward_init
    S: tp.Optional[tuple] = None  # stored as nested tuples to stay hashable
    M: tp.Optional[tuple] = None
    is_holding_error: bool = False

    def _masks(self):
        S = jnp.asarray(self.S) if self.S is not None else None
        M = jnp.asarray(self.M) if self.M is not None else None
        return S, M

    def energy(self, mu: Array, x: Array, extra: tp.Optional[dict] = None) -> Array:
        """Elementwise energy with S/M-mask semantics applied."""
        S, M = self._masks()
        if S is not None:
            if mu.ndim != 2 or x.ndim != 2:
                raise ValueError("S-mask energies require 2-D [batch, dim] mu/x")
            size_mu, size_x = mu.shape[1], x.shape[1]
            if S.shape != (size_mu, size_x):
                raise ValueError(f"S must be [{size_mu}, {size_x}], got {S.shape}")
            mu_e = jnp.broadcast_to(mu[:, :, None], (mu.shape[0], size_mu, size_x))
            x_e = jnp.broadcast_to(x[:, None, :], (x.shape[0], size_mu, size_x))
            inputs = {"mu": mu_e, "x": x_e}
            if extra:
                inputs.update(extra)
            return self.energy_fn(inputs) * S[None]
        inputs = {"mu": mu, "x": x}
        if extra:
            inputs.update(extra)
        e = self.energy_fn(inputs)
        if M is not None:
            e = e * M[None]
        return e

    def sample(self, mu: Array, x_prev: tp.Optional[Array], key: tp.Optional[Array]) -> Array:
        x = self.sample_x_fn({"mu": mu, "x": x_prev, "key": key})
        return jax.lax.stop_gradient(x)
