"""PCTrainer facade: the reference trainer API over the pure scan engine.

The reference ``PCTrainer`` (``/root/reference/predictive_coding/pc_trainer.py:22``)
mutates module state (latents live inside PCLayers, optimizers are torch
objects).  Here the trainer is a thin stateful shell: model parameters and
latents live in a shared :class:`GenerativeModel` handle (so a PC trainer and
an MCPC trainer can hand latents off for the canonical warm-start-then-sample
pattern, reference ``utils/model.py:121-149``), and every ``train_on_batch``
call dispatches to a cached, jitted pure function built by
:func:`..core.engine.build_train_on_batch`.

The MCPC Langevin noise — injected in the reference through the
``callback_after_t=random_step`` host callback (``utils/model.py:35-44``) — is
expressed as the jittable :class:`LangevinStep` config (or the
``langevin_var=`` shorthand), which compiles into the scan.
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp
import warnings

import jax
import jax.numpy as jnp

from .engine import EngineConfig, EngineState, build_train_on_batch
from .model import PCModel
from .optim import OptimizerSpec
from .schedule import build_plan

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LangevinStep:
    """Jittable stand-in for the reference ``random_step`` callback
    (utils/model.py:35-44): after each deterministic x-step, add Gaussian
    noise ``N(0, lr0 * var)`` to every latent.  ``var=2.0`` yields exact
    unadjusted Langevin dynamics with stationary distribution ∝ exp(-E)."""

    var: float = 2.0


@functools.lru_cache(maxsize=256)
def _static_loss_partial(loss_fn, static_items: tuple):
    """Stable-identity partial binding static kwargs into a loss fn, so the
    jit cache keyed on the callable keeps hitting across calls."""
    return functools.partial(loss_fn, **dict(static_items))


def _last_only_results(results: dict) -> dict:
    """``is_return_results_every_t=False`` post-processing (reference
    pc_trainer.py:684-694): keep only the last time step of every
    time-leading result.  Applied identically to the engine and kernel
    paths so the two are results-compatible."""

    def last_only(v):
        if isinstance(v, tuple):
            return tuple(last_only(x) for x in v)
        if hasattr(v, "ndim") and v.ndim >= 1:
            return v[-1:]
        return v

    # 'optimized_inputs' is [B, D] (batch-leading, not time-leading,
    # reference pc_trainer.py:754-759) — slicing it to [-1:] would
    # silently drop all but the last datapoint.
    not_time_leading = {
        k: results.pop(k) for k in ("optimized_inputs",) if k in results
    }
    results = {k: last_only(v) for k, v in results.items()}
    results.update(not_time_leading)
    return results


class GenerativeModel:
    """Holds a PCModel spec plus its explicit state (params, latents, PRNG).

    Plays the role of the reference's stateful ``nn.Sequential`` model that
    both trainers share.
    """

    def __init__(
        self,
        model: PCModel,
        key: tp.Union[Array, int],
        params=None,
        dtype=jnp.float32,
    ):
        self.model = model
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        self._key = key
        if params is None:
            self._key, sub = jax.random.split(self._key)
            params = model.init(sub, dtype)
        self.params = params
        self.latents: tp.Optional[tuple] = None

    def next_key(self) -> Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # reference-parity helpers ------------------------------------------------

    def get_model_xs(self):
        """All latent value nodes (reference pc_trainer.py:417-434)."""
        return self.latents

    def get_x(self, index: int = 0):
        """Latent of the index-th PC layer (reference pc_layer.py:130-133)."""
        return self.latents[index]

    def predict(self, inputs: Array) -> Array:
        """Eval-mode forward (PC layers are identity)."""
        return self.model.predict(self.params, inputs)

    def sample_latents(self, inputs: Array, key: tp.Optional[Array] = None):
        if key is None:
            key = self.next_key()
        self.latents = self.model.init_latents(
            self.params, inputs, key, self.latents
        )
        return self.latents

    def ancestral_sample(self, num_samples: int, key: tp.Optional[Array] = None):
        if key is None:
            key = self.next_key()
        return self.model.ancestral_sample(self.params, key, num_samples)


class PCTrainer:
    """Inference-learning trainer (reference pc_trainer.py:22-220 semantics).

    Args mirror the reference constructor; optimizers are given as
    ``('sgd'|'adam'|'adamw', kwargs)`` in torch-kwarg style or as
    :class:`OptimizerSpec`.
    """

    def __init__(
        self,
        model: GenerativeModel,
        optimizer_x_fn="sgd",
        optimizer_x_kwargs: tp.Optional[dict] = None,
        x_lr_amplifier: float = 1.0,
        x_lr_discount: float = 1.0,
        loss_x_fn: tp.Optional[tp.Callable] = None,
        loss_inputs_fn: tp.Optional[tp.Callable] = None,
        optimizer_p_fn="adam",
        optimizer_p_kwargs: tp.Optional[dict] = None,
        T: int = 512,
        update_x_at="all",
        update_p_at="all",
        accumulate_p_at="never",
        energy_coefficient: float = 1.0,
        early_stop_fn: tp.Optional[tp.Callable] = None,
        update_p_at_early_stop: bool = True,
    ):
        if not isinstance(model, GenerativeModel):
            raise TypeError("PCTrainer expects a GenerativeModel handle")
        self.gen = model
        self.T = int(T)
        if self.T < self.gen.model.get_least_T():
            warnings.warn(
                f"T={self.T} is less than the recommended minimum "
                f"{self.gen.model.get_least_T()} (num_pc_layers + 1); "
                "errors may not fully propagate through the stack "
                "(reference pc_trainer.py:199-220).",
                RuntimeWarning,
            )
        self.opt_x_spec = OptimizerSpec.from_torch_style(
            optimizer_x_fn, optimizer_x_kwargs or {"lr": 0.1}
        )
        self.opt_p_spec = (
            OptimizerSpec.from_torch_style(
                optimizer_p_fn, optimizer_p_kwargs or {"lr": 0.001}
            )
            if optimizer_p_fn is not None
            else None
        )
        update_p = update_p_at if self.opt_p_spec is not None else "never"
        self.plan = build_plan(
            self.T,
            update_x_at,
            update_p,
            accumulate_p_at,
            # with an early-stop predicate the update can fire at any step, so
            # parameter grads must stay live from t=0
            force_p_grads=early_stop_fn is not None,
        )
        self.x_lr_amplifier = float(x_lr_amplifier)
        self.x_lr_discount = float(x_lr_discount)
        self.loss_x_fn = loss_x_fn
        self.loss_inputs_fn = loss_inputs_fn
        self.energy_coefficient = float(energy_coefficient)
        self.early_stop_fn = early_stop_fn
        self.update_p_at_early_stop = bool(update_p_at_early_stop)

        # trainer-held optimizer state (torch keeps these on the optimizer
        # objects; recreated when latents are resampled,
        # reference pc_trainer.py:741-752)
        self._opt_x_state = None
        self._opt_p_state = None
        self._lr_scale = jnp.ones(())
        self._lr_scale_host = 1.0
        self._fns: dict = {}
        # 'auto': use the fused Pallas chain kernel on TPU when the config
        # maps onto it (see _pallas_eligible); True/False force/disable.
        self.use_pallas: tp.Union[str, bool] = "auto"
        # let the kernel serve capture requests (xs/representations/outputs)
        # via its HBM trajectory DMA; per-captured-step loss/energy scalars
        # are emitted with the engine's pre-update convention, so the capture
        # path is results-compatible with the engine (set False to force the
        # scan engine for captures).
        self.use_pallas_capture: bool = True
        # 'auto': keep every kernel matmul f32.  The round-5 hardware A/B
        # (BF16_AB.md: 9 interleaved marginal fits per cell) found bf16
        # separates NOWHERE on this workload — 5/9 paired wins and +2-3%
        # median at B in {256, 1024}, inside the tunnel noise floor and
        # below the pre-registered adoption rule (>=7/9 wins AND >=5%).
        # ROOFLINE.md explains why: at B>=1024 the per-step cost is
        # dominated by VPU terms (Box-Muller noise + sensory loss
        # gradient); the matmul floor bf16 can shrink is ~16-30% of the
        # step, bounding its best case under the threshold.  An explicit
        # True still opts in (f32 accumulate, f32 state).
        self.use_pallas_bf16: tp.Union[str, bool] = "auto"
        # kernel-fallback observability (the reference's slow-option-warning
        # role, predictive_coding/utils.py:8-16): when a dispatch that could
        # have used the fused kernel falls back to the scan engine, the
        # disqualifying option is recorded here and warned once per reason.
        self._kernel_fallback_reason: tp.Optional[tp.Tuple[str, str]] = None
        self._warned_fallbacks: set = set()

    # -- reference utility surface (pc_trainer.py:312-461) ---------------------

    def get_model_xs(self):
        return self.gen.latents

    def get_model_xs_copy(self):
        """Detached copies of all latents (reference pc_trainer.py:440-445)."""
        return tuple(jnp.array(x) for x in self.gen.latents)

    def get_model_representations(self, index: int = 0):
        """The first PC layer's latent (reference pc_trainer.py:437-438)."""
        return self.gen.latents[index]

    def get_is_model_has_pc_layers(self) -> bool:
        return self.gen.model.num_pc_layers > 0

    def get_model_pc_layers(self):
        """PC specs in stack order (reference pc_trainer.py:403-409)."""
        return self.gen.model.pc_layers

    def get_named_model_pc_layers(self):
        """(module-index, PC spec) pairs (reference pc_trainer.py:411-415)."""
        return tuple(
            (f"modules[{i}]", self.gen.model.modules[i])
            for i in self.gen.model.pc_indices
        )

    def get_energies(self, inputs=None, is_per_datapoint: bool = False):
        """Per-layer energies at the current latents (reference
        pc_trainer.py:331-366).  ``inputs`` defaults to the zeros
        pseudo-input."""
        if inputs is None:
            first = self.gen.model.modules[self.gen.model.linear_indices[0]]
            inputs = jnp.zeros((self.gen.latents[0].shape[0], first.in_dim))
        res = self.gen.model.apply(self.gen.params, self.gen.latents, inputs)
        return res.energies_per_datapoint if is_per_datapoint else res.energies

    def get_weights_norms_list(self):
        return [float(n) for n in self.get_weights_norms()]

    def set_x_lr(self, lr: float):
        """Set the effective x learning rate (reference pc_trainer.py:283-287)
        by adjusting the dynamic scale relative to the configured base lr."""
        self._lr_scale = jnp.asarray(lr / self.opt_x_spec.lr)
        self._lr_scale_host = lr / self.opt_x_spec.lr

    def get_numparameters(self, exclude_first_linear: bool = False) -> int:
        return self.gen.model.num_parameters(self.gen.params, exclude_first_linear)

    def get_weights_norms(self):
        return self.gen.model.weight_norms(self.gen.params)

    def get_least_T(self) -> int:
        return self.gen.model.get_least_T()

    def get_x_lr(self) -> float:
        return float(self.opt_x_spec.lr * self._lr_scale)

    def recreate_optimizer_x(self):
        self._opt_x_state = None
        self._lr_scale = jnp.ones(())
        self._lr_scale_host = 1.0  # host mirror (valid while dynamic lr is off)

    def recreate_optimizer_p(self):
        self._opt_p_state = None

    # -- fused-kernel fast path ---------------------------------------------------

    def _latent_layout(self):
        """Latent dims and their lane-aligned packed layout ``(pads, offs,
        XW)`` — the single source for both the eligibility budget estimate
        and ``_run_pallas``'s trajectory/moment unpacking, so the two can't
        drift."""
        from ..ops.pallas_mcpc import aligned_layout

        dims = [
            self.gen.model.modules[i].out_dim
            for i in self.gen.model.linear_indices[:-1]
        ]
        return dims, aligned_layout(dims)

    def _no_kernel(self, option: str, suggestion: str):
        """Record why this dispatch fell back to the scan engine (surfaced
        via ``utils.observability.slow_down_warning`` when the kernel was
        expected — TPU backend or ``use_pallas=True``)."""
        self._kernel_fallback_reason = (option, suggestion)
        return None

    def _warn_kernel_fallback(self) -> None:
        if self._kernel_fallback_reason is None:
            return
        if not (self.use_pallas is True or jax.default_backend() == "tpu"):
            return
        if self._kernel_fallback_reason in self._warned_fallbacks:
            return
        self._warned_fallbacks.add(self._kernel_fallback_reason)
        from ..utils.observability import slow_down_warning

        option, suggestion = self._kernel_fallback_reason
        slow_down_warning(
            "PCTrainer.train_on_batch",
            f"{option} (chain runs in the scan engine, not the fused kernel)",
            suggestion,
        )

    def _pallas_eligible(
        self, cfg: EngineConfig, loss_fn, is_optimize_inputs, langevin_var,
        batch_size: int,
    ):
        """The fused whole-chain kernel (ops/pallas_mcpc.py) covers the hot
        configurations over the canonical relu/tanh MLP:

        * 'langevin' mode — plain-SGD x-updates on every step, optional
          Langevin noise, parameter grads accumulated over a contiguous
          suffix window with a single update at the last step (the MCPC
          chain, reference training_evaluation.py:43-56);
        * 'warm' mode — Adam x-updates on every step (the PC MAP descent,
          reference training_evaluation.py:16-39), optionally emitting the
          final step's parameter gradients (update_p='last' PC training).
        """
        from ..core import losses as L
        from ..ops import model_activation, supports_model

        self._kernel_fallback_reason = None
        if self.use_pallas is False:
            return None
        if self.use_pallas == "auto" and jax.default_backend() != "tpu":
            return None
        activation = model_activation(self.gen.model)
        output_var = None
        if activation is None or not supports_model(self.gen.model, activation):
            from ..ops.pallas_mcpc import output_pc_var

            output_var = output_pc_var(self.gen.model)
            if output_var is None or activation is None:
                return self._no_kernel(
                    "a model topology outside the fused-kernel family",
                    "a relu/tanh Linear+PC stack (optional trailing PC)",
                )
        from ..ops.pallas_mcpc import _pick_batch_tile

        if batch_size > 1024 and _pick_batch_tile(batch_size) < 128:
            # no VMEM-tile divisor: the grid would serialize the chain ~B
            # times — the scan engine handles awkward batches in one pass
            return self._no_kernel(
                f"a batch size ({batch_size}) with no 128-lane tile divisor",
                "a multiple of 128",
            )
        if self.opt_x_spec.name == "sgd" and not self.opt_x_spec.momentum:
            mode = "langevin"
        elif self.opt_x_spec.name == "adam" and not self.opt_x_spec.weight_decay:
            mode = "warm"
        else:
            return self._no_kernel(
                f"optimizer_x_fn={self.opt_x_spec.name} with "
                "momentum/weight_decay",
                "plain sgd or adam",
            )
        if cfg.energy_coefficient != 1.0:
            # the kernel hardcodes overall = loss + 1.0 * energy
            return self._no_kernel("energy_coefficient != 1.0", "1.0")
        if self._lr_scale_host is None or self._lr_scale_host <= 0.0:
            # a dynamic-annealing run left the live scale device-side only;
            # the host mirror is unknown, so the kernel's static lr can't
            # fold it (see train_on_batch's post-run invalidation)
            return self._no_kernel(
                "set_x_lr after a dynamic-lr run (device-only scale)",
                "set_x_lr/recreate_optimizer_x to re-arm",
            )
        if cfg.dynamic_x_lr or cfg.early_stop_fn is not None:
            return self._no_kernel(
                "x_lr_discount/x_lr_amplifier or early_stop_fn",
                "1.0 / None",
            )
        if cfg.loss_x_fn is not None or cfg.loss_inputs_fn is not None or is_optimize_inputs:
            return self._no_kernel(
                "loss_x_fn / loss_inputs_fn / is_optimize_inputs",
                "None / False",
            )
        # 'outputs' captures are served from the latent trajectory
        # (outputs_t = act(x2_t) @ W3 + b3, the same pre-update forward the
        # engine records)
        wants_traj = (
            cfg.capture_representations or cfg.capture_xs or cfg.capture_outputs
        )
        if cfg.capture_overall_elementwise:
            return self._no_kernel("is_return_batchelement_loss", "False")
        if wants_traj and not self.use_pallas_capture:
            return None  # user explicitly routed captures to the engine
        scalar_stride = 0
        if cfg.capture_every_t and not wants_traj:
            # Per-step loss/energy curves (the reference's DEFAULT
            # is_return_results_every_t=True, pc_trainer.py:777-795) with no
            # trajectory captures: the kernel emits the scalar rows itself
            # (lane-packed VMEM slots, ops.mcpc_chain_pallas scalar_stride)
            # — no HBM trajectory, so any chain length qualifies
            scalar_stride = max(int(cfg.capture_stride), 1)
        warm_cont = False
        if mode == "warm":
            # noise lives in the Langevin phase only (captures ride the warm
            # trajectory DMA)
            if langevin_var is not None:
                return self._no_kernel(
                    "LangevinStep noise under an Adam x-optimizer",
                    "sgd for Langevin chains",
                )
            if self._opt_x_state is not None:
                # continuation call (no resample): the kernel accepts the
                # live Adam moments + count as inputs (reference semantics:
                # the optimizer object persists, pc_trainer.py:741-752)
                if self._adam_moments(self._opt_x_state) is None:
                    return self._no_kernel(
                        "a continuation with a non-plain-Adam optimizer-x "
                        "state",
                        "is_reset_optimizer_x_at_batch_start=True",
                    )
                warm_cont = True
        plan = cfg.plan
        if plan.update_x_at != tuple(range(plan.T)):
            return self._no_kernel("update_x_at != 'all'", "'all'")
        # static kwargs ('perc', '_reduction') arrive pre-bound in a partial
        # (train_on_batch's _static_loss_partial) — unwrap to identify the
        # base loss and the mask fraction
        base_fn, static_kw = loss_fn, {}
        if isinstance(loss_fn, functools.partial):
            base_fn = loss_fn.func
            static_kw = dict(loss_fn.keywords)
        loss_name = None
        mask_perc = None
        if base_fn is L.bernoulli_fn:
            if static_kw.get("_reduction", "sum") == "sum":
                loss_name = "bernoulli"
        elif base_fn is L.fe_fn:
            loss_name = "gaussian"
        elif base_fn is L.bernoulli_fn_mask:
            loss_name = "bernoulli_mask"
            mask_perc = float(static_kw.get("perc", 0.5))
        elif base_fn is L.fe_fn_mask:
            loss_name = "gaussian_mask"
            mask_perc = float(static_kw.get("perc", 0.5))
        elif base_fn is L.zero_fn or loss_fn is None:
            loss_name = "none"
        if loss_name is None:
            return self._no_kernel(
                "an unsupported loss_fn",
                "fe_fn/bernoulli_fn (+_mask) or zero_fn",
            )
        if output_var is not None and loss_name != "none":
            # trailing-PC joint samplers are unclamped by construction
            # (reference figure_3.py:47-55)
            return self._no_kernel(
                "a sensory loss on an output-PC joint sampler",
                "zero_fn",
            )
        cap = {}
        if wants_traj:
            cap = {
                "capture_stride": max(int(cfg.capture_stride), 1),
                "capture_xs": cfg.capture_xs,
                "capture_representations": cfg.capture_representations,
                "capture_outputs": cfg.capture_outputs,
            }
        elif scalar_stride:
            cap = {"scalar_stride": scalar_stride}
        base = {"loss": loss_name, "mode": mode, "activation": activation,
                "output_var": output_var, "mask_perc": mask_perc,
                "warm_cont": warm_cont}
        if not plan.update_p_at:
            return {**base, "with_pgrads": False, "mixing": 0, **cap}
        if plan.update_p_at != (plan.T - 1,):
            return self._no_kernel(
                "update_p_at other than 'last'/'never'", "'last' or 'never'"
            )
        if plan.accumulate_p_at:
            if mode == "warm":
                # warm-mode pgrads come from the last step only
                return self._no_kernel(
                    "accumulate_p_at under an Adam x-optimizer",
                    "'never' (last-step grads) or sgd",
                )
            acc = plan.accumulate_p_at
            if acc != tuple(range(acc[0], plan.T)):
                return self._no_kernel(
                    "a non-contiguous accumulate_p_at window",
                    "a contiguous suffix [mixing, T)",
                )
            mixing = acc[0]
        else:
            mixing = plan.T - 1
        return {**base, "with_pgrads": True, "mixing": mixing, **cap}

    def _adam_moments(self, opt_state):
        """Extract ``(mu, nu, count)`` per-latent Adam moments from a live
        optimizer-x state, or None if the state isn't a single plain
        scale_by_adam over the current latents (the only shape the kernel's
        warm-continuation inputs can represent)."""
        import optax

        is_adam = lambda s: isinstance(s, optax.ScaleByAdamState)
        leaves = [
            s
            for s in jax.tree_util.tree_leaves(opt_state, is_leaf=is_adam)
            if is_adam(s)
        ]
        if len(leaves) != 1:
            return None
        st = leaves[0]
        mu, nu = st.mu, st.nu
        if not (
            isinstance(mu, dict)
            and set(mu.keys()) == {"latents"}
            and isinstance(nu, dict)
            and set(nu.keys()) == {"latents"}
        ):
            return None
        lat = self.gen.latents
        mu_t, nu_t = tuple(mu["latents"]), tuple(nu["latents"])
        if len(mu_t) != len(lat) or any(
            m.shape != x.shape for m, x in zip(mu_t, lat)
        ):
            return None
        return mu_t, nu_t, st.count

    def _run_pallas(self, dispatch, cfg, inputs, loss_fn_kwargs, langevin_var, key):
        from ..ops import mcpc_chain_pallas

        gen = self.gen
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        target = loss_fn_kwargs.get("_target")
        input_var = loss_fn_kwargs.get("_var") or 1.0
        stride = dispatch.get("capture_stride", 0)
        scalar_stride = dispatch.get("scalar_stride", 0)
        on_tpu = jax.default_backend() == "tpu"
        # set_x_lr folds into the kernel's static lr (the host mirror is
        # exact — eligibility rejects unknown/dynamic scales).  Both SGD and
        # Adam updates are linear in lr, and the engine's Langevin std is
        # sqrt(lr0*var) * scale = sqrt((lr0*scale) * (var*scale)).
        scale = self._lr_scale_host
        lr_eff = self.opt_x_spec.lr * scale
        if langevin_var is not None:
            langevin_var = langevin_var * scale
        if dispatch["mode"] == "warm":
            # full-chain Adam MAP descent (+ optional last-step pgrads); the
            # final Adam moments come back so continuation calls (no
            # resample) hand the engine a live optimizer-x state, matching
            # the reference's persistent optimizer object
            # (pc_trainer.py:741-752)
            phase = dict(
                T=0,
                lr=lr_eff,
                noise_var=None,
                warm_T=self.T,
                warm_lr=lr_eff,
                warm_b1=self.opt_x_spec.betas[0],
                warm_b2=self.opt_x_spec.betas[1],
                warm_eps=self.opt_x_spec.eps,
                warm_pgrads=dispatch["with_pgrads"],
                emit_warm_opt_state=True,
            )
            if dispatch.get("warm_cont"):
                mu_in, nu_in, count_in = self._adam_moments(self._opt_x_state)
                phase.update(
                    warm_mu=mu_in, warm_nu=nu_in, warm_count=count_in
                )
        else:
            phase = dict(T=self.T, lr=lr_eff, noise_var=langevin_var)
        bf16 = self.use_pallas_bf16
        if bf16 == "auto":
            # Settled by measurement (BF16_AB.md, round 5): bf16 fails the
            # pre-registered adoption rule at every measured batch size
            # (5/9 paired wins, +2-3% median — tunnel noise floor), so
            # 'auto' is f32 everywhere.  The round-3 "+28% at B=1024"
            # heuristic this replaced was a single-run marginal fit — noise
            # (the three instruments at B=1024 read x0.95, x1.06 and
            # x1.02).  Explicit use_pallas_bf16=True still opts in.
            bf16 = False
        output_pc = dispatch.get("output_var") is not None
        outs = mcpc_chain_pallas(
            gen.params,
            gen.latents,
            target,
            seed,
            loss=dispatch["loss"],
            input_var=float(input_var),
            mixing=dispatch["mixing"],
            with_pgrads=dispatch["with_pgrads"],
            capture_stride=stride,
            scalar_stride=scalar_stride,
            activation=dispatch["activation"],
            return_scalars=True,
            bf16_matmul=bool(bf16),
            output_var=dispatch.get("output_var"),
            mask_perc=dispatch.get("mask_perc"),
            # off-TPU (use_pallas=True forced, e.g. in tests) run interpreted
            interpret=not on_tpu,
            **phase,
        )
        outs = list(outs)
        new_latents, pgrads = outs[0], outs[1]
        k = 2
        traj = traj3 = None
        if stride:
            traj = outs[k]
            k += 1
            if output_pc:
                traj3 = outs[k]
                k += 1
        scalars = outs[k]
        k += 1
        warm_mv = outs[k] if dispatch["mode"] == "warm" else None
        # aligned-layout geometry shared by the warm-moment graft and the
        # trajectory unpacking below
        dims, (_, offs, _) = self._latent_layout()
        D_out = gen.model.modules[gen.model.linear_indices[-1]].out_dim
        # the params in force DURING the chain (captures are pre-update)
        chain_last_linear = gen.params[-1]
        gen.latents = new_latents
        if warm_mv is not None or (
            dispatch["with_pgrads"] and self.opt_p_spec is not None
        ):
            import optax
        if warm_mv is not None:
            def split(packed, tail=None):
                # aligned packed [B, XW] -> per-latent blocks (+ the trailing
                # PC site's moments for output-PC models)
                blocks = tuple(
                    packed[:, o : o + d] for o, d in zip(offs, dims)
                )
                if tail is not None:
                    blocks = blocks + (tail[:, :D_out],)
                return blocks

            mu_t = split(warm_mv[0], warm_mv[2] if output_pc else None)
            nu_t = split(warm_mv[1], warm_mv[3] if output_pc else None)
            # init through the spec so the state pytree always matches what
            # the engine's optax chain expects, then graft the kernel's
            # final moments into the (unique) ScaleByAdamState leaf
            count_out = jnp.asarray(self.T, jnp.int32)
            if dispatch.get("warm_cont"):
                count_out = count_out + jnp.asarray(
                    self._adam_moments(self._opt_x_state)[2], jnp.int32
                )
            fresh = self.opt_x_spec.make().init({"latents": gen.latents})
            is_adam = lambda s: isinstance(s, optax.ScaleByAdamState)
            grafted = jax.tree_util.tree_map(
                lambda s: s._replace(
                    count=count_out,
                    mu={"latents": mu_t},
                    nu={"latents": nu_t},
                )
                if is_adam(s)
                else s,
                fresh,
                is_leaf=is_adam,
            )
            self._opt_x_state = grafted
        if dispatch["with_pgrads"] and self.opt_p_spec is not None:
            from .engine import tree_scale

            opt_p = self.opt_p_spec.make()
            if self._opt_p_state is None:
                self._opt_p_state = opt_p.init(gen.params)
            divisor = float(cfg.plan.p_divisor_steps * inputs.shape[0])
            updates, self._opt_p_state = opt_p.update(
                tree_scale(pgrads, 1.0 / divisor), self._opt_p_state, gen.params
            )
            gen.params = optax.apply_updates(gen.params, updates)
        # kernel-emitted scalars, PRE-update per step (the engine/reference
        # convention, pc_trainer.py:777-795): rows 0..n_cap-1 are the
        # captured steps, the last row is the final step
        loss_rows, energy_rows = scalars["loss"], scalars["energy"]
        if cfg.capture_every_t and (traj is not None or scalar_stride):
            loss_v, energy_v = loss_rows[:-1], energy_rows[:-1]
        else:
            loss_v, energy_v = loss_rows[-1:], energy_rows[-1:]
        results = {
            "loss": loss_v,
            "energy": energy_v,
            "overall": loss_v + cfg.energy_coefficient * energy_v,
            "x_lr_scale": jnp.full_like(loss_v, scale),
            "stop_t": jnp.full((), -1, dtype=jnp.int32),
        }
        if traj is not None:
            if dispatch.get("capture_xs"):
                xs = tuple(
                    traj[:, :, o : o + d] for o, d in zip(offs, dims)
                )
                if output_pc:
                    xs = xs + (traj3[:, :, :D_out],)
                results["xs"] = xs
            if dispatch.get("capture_representations"):
                ri = cfg.rep_index
                results["representations"] = traj[
                    :, :, offs[ri] : offs[ri] + dims[ri]
                ]
            if dispatch.get("capture_outputs"):
                if output_pc:
                    # the trailing PC site IS the model output in train-mode
                    # forwards (PCLayer returns x, reference pc_layer.py:300)
                    results["outputs"] = traj3[:, :, :D_out]
                else:
                    # outputs_t = act(x2_t) @ W3 + b3 — the same pre-update
                    # forward the engine records (the trajectory holds the
                    # pre-update latents at each captured step)
                    x2 = traj[:, :, offs[2] : offs[2] + dims[2]]
                    h2 = (
                        jnp.maximum(x2, 0.0)
                        if dispatch["activation"] == "relu"
                        else jnp.tanh(x2)
                    )
                    results["outputs"] = (
                        h2 @ chain_last_linear["w"] + chain_last_linear["b"]
                    )
        return results

    # -- core entry point -------------------------------------------------------

    def _get_fn(self, cfg: EngineConfig):
        key = cfg
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(build_train_on_batch(self.gen.model, cfg))
            self._fns[key] = fn
        return fn

    def train_on_batch(
        self,
        inputs: Array,
        loss_fn: tp.Optional[tp.Callable] = None,
        loss_fn_kwargs: tp.Optional[dict] = None,
        is_sample_x_at_batch_start: bool = True,
        is_reset_optimizer_x_at_batch_start: bool = False,
        is_reset_optimizer_p_at_batch_start: bool = False,
        is_optimize_inputs: bool = False,
        callback_after_t: tp.Optional[LangevinStep] = None,
        langevin_var: tp.Optional[float] = None,
        is_return_results_every_t: bool = True,
        is_return_outputs: bool = False,
        is_return_representations: bool = False,
        is_return_xs: bool = False,
        is_return_batchelement_loss: bool = False,
        capture_stride: int = 1,
        key: tp.Optional[Array] = None,
    ) -> dict:
        """Run T inference iterations on one batch (reference
        pc_trainer.py:500-981).  Returns the results dict with per-step
        ``loss`` / ``energy`` / ``overall`` arrays plus requested captures."""
        inputs = jnp.asarray(inputs)
        loss_fn_kwargs = dict(loss_fn_kwargs or {})
        # kwargs that select static slices / reductions must be baked into the
        # loss function, not traced (e.g. 'perc' of the masked losses,
        # reference utils/model.py:24-33)
        static_keys = tuple(
            k for k in ("perc", "_reduction") if k in loss_fn_kwargs
        )
        if loss_fn is not None and static_keys:
            static_part = tuple((k, loss_fn_kwargs.pop(k)) for k in static_keys)
            loss_fn = _static_loss_partial(loss_fn, static_part)
        if isinstance(callback_after_t, LangevinStep):
            langevin_var = callback_after_t.var
        elif callback_after_t is not None:
            raise TypeError(
                "callback_after_t must be a LangevinStep; arbitrary host "
                "callbacks do not exist in the compiled engine — express the "
                "hook as config (see LangevinStep) or post-process results."
            )

        gen = self.gen
        # latent (re)sampling triggers, mirroring pc_layer.py:184-218
        resample = is_sample_x_at_batch_start
        if not resample:
            if gen.latents is None:
                warnings.warn(
                    "latents have not been initialized yet; sampling them now "
                    "(reference pc_layer.py:190-196).",
                    RuntimeWarning,
                )
                resample = True
            elif gen.latents[0].shape[0] != inputs.shape[0]:
                warnings.warn(
                    "batch size changed; resampling latents "
                    "(reference pc_layer.py:209-218).",
                    RuntimeWarning,
                )
                resample = True

        if resample:
            gen.sample_latents(inputs, key=key)
            self.recreate_optimizer_x()
        else:
            if is_reset_optimizer_x_at_batch_start:
                self.recreate_optimizer_x()
        if is_reset_optimizer_p_at_batch_start:
            self.recreate_optimizer_p()

        cfg = EngineConfig(
            plan=self.plan,
            optimizer_x=self.opt_x_spec,
            optimizer_p=self.opt_p_spec,
            energy_coefficient=self.energy_coefficient,
            x_lr_discount=self.x_lr_discount,
            x_lr_amplifier=self.x_lr_amplifier,
            langevin_var=langevin_var,
            loss_fn=loss_fn,
            loss_x_fn=self.loss_x_fn,
            loss_inputs_fn=self.loss_inputs_fn,
            early_stop_fn=self.early_stop_fn,
            update_p_at_early_stop=self.update_p_at_early_stop,
            optimize_inputs=is_optimize_inputs,
            capture_every_t=is_return_results_every_t,
            capture_outputs=is_return_outputs,
            capture_representations=is_return_representations,
            capture_xs=is_return_xs,
            capture_overall_elementwise=is_return_batchelement_loss,
            capture_stride=int(capture_stride),
        )
        dispatch = self._pallas_eligible(
            cfg, loss_fn, is_optimize_inputs, langevin_var, inputs.shape[0]
        )
        if dispatch is not None and any(
            k.startswith("energy__") for k in loss_fn_kwargs
        ):
            # extra energy inputs aren't kernel-representable
            dispatch = self._no_kernel(
                "energy__* extra energy inputs", "a plain energy_fn"
            )
        if dispatch is None:
            self._warn_kernel_fallback()
        if dispatch is not None:
            results = self._run_pallas(
                dispatch, cfg, inputs, loss_fn_kwargs, langevin_var,
                key if key is not None else gen.next_key(),
            )
            if not is_return_results_every_t:
                results = _last_only_results(results)
            return results

        fn = self._get_fn(cfg)

        opt_x = self.opt_x_spec.make()
        xs_tree = {"latents": gen.latents}
        if is_optimize_inputs:
            xs_tree["inputs"] = inputs
        if self._opt_x_state is None:
            self._opt_x_state = opt_x.init(xs_tree)
        if self._opt_p_state is None and self.opt_p_spec is not None:
            self._opt_p_state = self.opt_p_spec.make().init(gen.params)

        state = EngineState(
            params=gen.params,
            latents=gen.latents,
            opt_x_state=self._opt_x_state,
            opt_p_state=self._opt_p_state,
            lr_scale=self._lr_scale,
            key=key if key is not None else gen.next_key(),
        )
        new_state, results = fn(state, inputs, loss_fn_kwargs)

        gen.params = new_state.params
        gen.latents = new_state.latents
        self._opt_x_state = new_state.opt_x_state
        self._opt_p_state = new_state.opt_p_state
        self._lr_scale = new_state.lr_scale
        if cfg.dynamic_x_lr:
            # the live scale now exists only device-side; invalidate the
            # host mirror so the kernel path can't fold a stale value
            # (it re-arms via set_x_lr / recreate_optimizer_x)
            self._lr_scale_host = None

        if not is_return_results_every_t:
            results = _last_only_results(results)
        return results
