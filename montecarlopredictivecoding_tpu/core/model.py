"""PCModel: a pure-functional predictive-coding stack.

The reference expresses models as ``nn.Sequential`` with stateful ``PCLayer``
modules (``/root/reference/utils/model.py:54-65``).  Here a model is a static
tuple of specs plus two explicit pytrees:

* ``params``  — tuple with one dict per :class:`Linear` module;
* ``latents`` — tuple with one ``[batch, dim]`` array per :class:`PC` module.

Everything is jit/vmap/pjit-compatible: the forward walk happens at trace
time over the static module list and compiles to one fused XLA computation.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from .modules import PC, Activation, Linear

Array = jax.Array
Params = tp.Tuple[dict, ...]
Latents = tp.Tuple[Array, ...]


@dataclasses.dataclass(frozen=True)
class ForwardResult:
    output: Array
    energies: tp.Tuple[Array, ...]  # per-PC-layer scalar energies (summed)
    energies_per_datapoint: tp.Tuple[Array, ...]  # per-PC [batch, 1]
    mus: tp.Tuple[Array, ...]  # per-PC incoming prediction
    errors: tp.Tuple[tp.Optional[Array], ...]  # x - mu where is_holding_error


class PCModel:
    """A static stack of Linear / Activation / PC specs."""

    def __init__(self, modules: tp.Sequence):
        self.modules = tuple(modules)
        self.linear_indices = tuple(
            i for i, m in enumerate(self.modules) if isinstance(m, Linear)
        )
        self.pc_indices = tuple(
            i for i, m in enumerate(self.modules) if isinstance(m, PC)
        )

    # -- structure ---------------------------------------------------------

    @property
    def num_pc_layers(self) -> int:
        return len(self.pc_indices)

    @property
    def pc_layers(self) -> tp.Tuple[PC, ...]:
        return tuple(self.modules[i] for i in self.pc_indices)

    def get_least_T(self) -> int:
        """Minimum sensible inference-step count (reference
        pc_trainer.py:447-461): one per PC layer plus one."""
        return self.num_pc_layers + 1

    # -- parameters ---------------------------------------------------------

    def init(self, key: Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, max(len(self.linear_indices), 1))
        params = []
        k = 0
        for m in self.modules:
            if isinstance(m, Linear):
                params.append(m.init(keys[k], dtype))
                k += 1
        return tuple(params)

    def num_parameters(self, params: Params, exclude_first_linear: bool = False) -> int:
        """Parameter count, optionally excluding the first Linear — the
        learned top-layer prior (reference pc_trainer.py:384-390)."""
        start = 1 if exclude_first_linear else 0
        return sum(
            int(jnp.size(leaf))
            for p in params[start:]
            for leaf in jax.tree_util.tree_leaves(p)
        )

    def weight_norms(self, params: Params) -> tp.Tuple[Array, ...]:
        """Frobenius norm of each Linear weight (reference
        pc_trainer.py:392-401)."""
        return tuple(jnp.linalg.norm(p["w"]) for p in params)

    # -- forward ------------------------------------------------------------

    def _walk(
        self,
        params: Params,
        inputs: Array,
        on_pc: tp.Callable[[int, PC, Array], Array],
    ) -> Array:
        """Shared forward walk: ``on_pc(pc_idx, spec, mu) -> x`` decides what a
        PC site emits."""
        h = inputs
        li = 0
        pi = 0
        for m in self.modules:
            if isinstance(m, Linear):
                h = m.apply(params[li], h)
                li += 1
            elif isinstance(m, Activation):
                h = m.apply(h)
            elif isinstance(m, PC):
                h = on_pc(pi, m, h)
                pi += 1
            else:
                raise TypeError(f"unknown module spec {m!r}")
        return h

    def apply(
        self,
        params: Params,
        latents: Latents,
        inputs: Array,
        energy_fn_additional_inputs: tp.Optional[dict] = None,
    ) -> ForwardResult:
        """Train-mode forward: PC sites emit their latent ``x`` and record the
        layer energy (reference pc_layer.py:161-300)."""
        energies: list = []
        energies_pd: list = []
        mus: list = []
        errors: list = []

        def on_pc(pi: int, spec: PC, mu: Array) -> Array:
            x = latents[pi]
            e = spec.energy(mu, x, energy_fn_additional_inputs)
            energies.append(jnp.sum(e))
            # per-datapoint energy: sum over all non-batch dims -> [B, 1]
            # (reference pc_layer.py:283-293)
            energies_pd.append(
                jnp.sum(e, axis=tuple(range(1, e.ndim)))[:, None]
            )
            mus.append(mu)
            errors.append(
                jax.lax.stop_gradient(x - mu) if spec.is_holding_error else None
            )
            return x

        output = self._walk(params, inputs, on_pc)
        return ForwardResult(
            output=output,
            energies=tuple(energies),
            energies_per_datapoint=tuple(energies_pd),
            mus=tuple(mus),
            errors=tuple(errors),
        )

    def predict(self, params: Params, inputs: Array) -> Array:
        """Eval-mode forward: PC sites are the identity
        (reference pc_layer.py:302-304)."""
        return self._walk(params, inputs, lambda pi, spec, mu: mu)

    def init_latents(
        self,
        params: Params,
        inputs: Array,
        key: tp.Optional[Array] = None,
        latents_prev: tp.Optional[Latents] = None,
    ) -> Latents:
        """Sample fresh latents via each PC site's ``sample_x_fn`` during a
        forward pass — subsequent predictions are computed from the freshly
        sampled latents, exactly as in the reference where sampling happens
        inside forward (reference pc_layer.py:221-233)."""
        n = self.num_pc_layers
        keys = jax.random.split(key, n) if key is not None else [None] * n
        out: list = []

        def on_pc(pi: int, spec: PC, mu: Array) -> Array:
            prev = latents_prev[pi] if latents_prev is not None else None
            x = spec.sample(mu, prev, keys[pi])
            out.append(x)
            return x

        self._walk(params, inputs, on_pc)
        return tuple(out)

    def ancestral_sample(
        self,
        params: Params,
        key: Array,
        num_samples: int,
        input_dim: tp.Optional[int] = None,
    ) -> Array:
        """Prior -> data ancestral sampling: at each PC site draw
        ``x ~ N(mu, I)``; return the pre-sensory activations
        (reference utils/training_evaluation.py:72-92)."""
        if input_dim is None:
            first = self.modules[self.linear_indices[0]]
            input_dim = first.in_dim
        keys = jax.random.split(key, self.num_pc_layers)

        def on_pc(pi: int, spec: PC, mu: Array) -> Array:
            return mu + jax.random.normal(keys[pi], mu.shape, mu.dtype)

        zeros = jnp.zeros((num_samples, input_dim))
        return self._walk(params, zeros, on_pc)


def make_mlp_model(
    input_size: int,
    hidden_size: int,
    hidden2_size: int,
    output_size: int,
    activation: str = "relu",
    sample_x_fn=None,
    output_pc: tp.Optional[PC] = None,
) -> PCModel:
    """The canonical 4-Linear generative MLP (reference utils/model.py:47-69):

    ``Linear(d0,d0) -> PC -> act -> Linear(d0,d1) -> PC -> act
    -> Linear(d1,d2) -> PC -> act -> Linear(d2,out)``

    fed a zeros pseudo-input so the first Linear outputs its learned bias
    (the top-layer prior mean).  ``output_pc`` optionally appends a trailing
    PC site so the sensory layer itself becomes an unclamped latent
    (reference figure_3.py:47-55, figure_6.py:80-84).
    """
    from .modules import uniform_init

    if sample_x_fn is None:
        sample_x_fn = uniform_init
    mods: list = [
        Linear(input_size, input_size),
        PC(sample_x_fn=sample_x_fn),
        Activation(activation),
        Linear(input_size, hidden_size),
        PC(sample_x_fn=sample_x_fn),
        Activation(activation),
        Linear(hidden_size, hidden2_size),
        PC(sample_x_fn=sample_x_fn),
        Activation(activation),
        Linear(hidden2_size, output_size),
    ]
    if output_pc is not None:
        mods.append(output_pc)
    return PCModel(mods)
