"""The inference-learning engine: T-step predictive-coding inference as
``lax.scan``.

This replaces the reference's Python loop of per-step autograd + optimizer
mutations (``/root/reference/predictive_coding/pc_trainer.py:712-981``) with a
single compiled XLA while-loop per schedule *segment*.  Segments (from
:mod:`.schedule`) split the T steps so parameter gradients are only computed
on steps whose contribution can reach a parameter update — e.g. the MCPC
config (warm-up ``mixing`` steps, then ``sampling`` accumulation steps,
reference ``utils/training_evaluation.py:43-56``) compiles to one scan without
parameter grads followed by one scan that also accumulates the Monte-Carlo
Hebbian gradient.

Semantics preserved from the reference loop (pc_trainer.py:712-981):

* one objective evaluation per step: ``overall = loss + c * Σ energies
  (+ loss_x + loss_inputs)``;
* x-step at steps in ``update_x_at`` using only the current step's gradient
  (torch zeroes x-grads right before each used backward);
* parameter grads accumulate across *every* step since the last zero event
  (zero events: update steps outside the accumulation window; the first
  accumulation step), and the parameter step divides by
  ``len(accumulate_p_at) * batch_size`` (or ``batch_size``);
* dynamic x-lr: multiply by ``x_lr_discount`` if overall did not decrease
  w.r.t. the previous step, by ``x_lr_amplifier`` otherwise, after each
  x-step from t>=1 (pc_trainer.py:881-901);
* MCPC Langevin noise: after the deterministic x-step, add
  ``N(0, lr0 * var)`` to every latent, where ``lr0`` is the *initial* x
  learning rate — the reference reads ``optimizer.defaults['lr']``
  (utils/model.py:35-44), so noise ignores dynamic-lr annealing;
* early stop: a jittable predicate replaces the reference's ``eval()`` string
  (pc_trainer.py:845); after it fires the chain freezes (updates, noise and
  grad accumulation are masked), and the parameter update still applies when
  ``update_p_at_early_stop`` (the default).
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
import optax

from .model import PCModel
from .optim import OptimizerSpec
from .schedule import SchedulePlan, Segment

Array = jax.Array


# -- small pytree helpers ----------------------------------------------------


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_scale(a, s):
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_select(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


# -- static engine configuration ---------------------------------------------


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    plan: SchedulePlan
    optimizer_x: OptimizerSpec
    optimizer_p: tp.Optional[OptimizerSpec]
    energy_coefficient: float = 1.0
    x_lr_discount: float = 1.0
    x_lr_amplifier: float = 1.0
    langevin_var: tp.Optional[float] = None
    loss_fn: tp.Optional[tp.Callable] = None
    loss_x_fn: tp.Optional[tp.Callable] = None
    loss_inputs_fn: tp.Optional[tp.Callable] = None
    early_stop_fn: tp.Optional[tp.Callable] = None
    update_p_at_early_stop: bool = True
    optimize_inputs: bool = False
    capture_every_t: bool = True
    capture_outputs: bool = False
    capture_representations: bool = False
    capture_xs: bool = False
    capture_overall_elementwise: bool = False
    capture_stride: int = 1
    rep_index: int = 0

    @property
    def dynamic_x_lr(self) -> bool:
        return self.x_lr_discount < 1.0 or self.x_lr_amplifier > 1.0


class EngineState(tp.NamedTuple):
    """Traced state threaded through train_on_batch."""

    params: tp.Any
    latents: tp.Any
    opt_x_state: tp.Any
    opt_p_state: tp.Any
    lr_scale: Array
    key: Array


def _objective(cfg: EngineConfig, model: PCModel):
    def objective(xs_tree, params, ext_inputs, loss_kwargs):
        latents = xs_tree["latents"]
        inputs = xs_tree["inputs"] if cfg.optimize_inputs else ext_inputs
        # loss_kwargs entries prefixed "energy__" are forwarded into the
        # per-layer energy_fns (reference energy_fn_additional_inputs,
        # pc_layer.py:161-270)
        extra = {
            k[len("energy__"):]: v
            for k, v in loss_kwargs.items()
            if k.startswith("energy__")
        }
        loss_kwargs = {
            k: v for k, v in loss_kwargs.items() if not k.startswith("energy__")
        }
        res = model.apply(
            params, latents, inputs,
            energy_fn_additional_inputs=extra or None,
        )
        energy = functools.reduce(jnp.add, res.energies) if res.energies else jnp.zeros(())
        parts = []
        loss = None
        if cfg.loss_fn is not None:
            loss = cfg.loss_fn(res.output, **loss_kwargs)
            parts.append(loss)
        parts.append(energy * cfg.energy_coefficient)
        if cfg.loss_x_fn is not None:
            parts.append(
                functools.reduce(
                    jnp.add, [jnp.sum(cfg.loss_x_fn(x)) for x in latents]
                )
            )
        if cfg.loss_inputs_fn is not None and cfg.optimize_inputs:
            parts.append(cfg.loss_inputs_fn(inputs))
        overall = functools.reduce(jnp.add, parts)
        aux = {
            "loss": loss if loss is not None else jnp.zeros(()),
            "energy": energy,
            "overall": overall,
        }
        if cfg.capture_outputs:
            aux["outputs"] = res.output
        if cfg.capture_overall_elementwise:
            e_pd = functools.reduce(jnp.add, res.energies_per_datapoint)[:, 0]
            loss_elem = jnp.zeros_like(e_pd)
            if cfg.loss_fn is not None:
                kw = dict(loss_kwargs)
                kw["_reduction"] = "none"
                loss_elem = jnp.sum(cfg.loss_fn(res.output, **kw), axis=-1)
            aux["overall_elementwise"] = e_pd + loss_elem
        return overall, aux

    return objective


def _run_segment(
    cfg: EngineConfig,
    model: PCModel,
    seg: Segment,
    opt_x: optax.GradientTransformation,
    params,
    carry: dict,
    ext_inputs,
    loss_kwargs,
    opt_p: tp.Optional[optax.GradientTransformation] = None,
    batch_size: tp.Optional[int] = None,
):
    """Run one contiguous scan segment; returns (carry, ys).

    For dense schedules (``seg.p_update_every_step``) the parameters and the
    parameter-optimizer state live in the carry and step every iteration
    (grads divided by the batch size, reference pc_trainer.py:904-913)."""
    objective = _objective(cfg, model)
    dense_p = seg.p_update_every_step and opt_p is not None
    grad_argnums = (0, 1) if (seg.with_p_grads or dense_p) else (0,)
    vgrad = jax.value_and_grad(objective, argnums=grad_argnums, has_aux=True)

    noise_std = (
        float(cfg.langevin_var * cfg.optimizer_x.lr) ** 0.5
        if cfg.langevin_var is not None
        else None
    )

    acc_set = set(cfg.plan.accumulate_p_at)

    def step(carry, xt):
        xs_tree = carry["xs_tree"]
        key = carry["key"]
        key, k_noise = jax.random.split(key)
        step_params = carry["params"] if dense_p else params

        if seg.with_p_grads or dense_p:
            (overall, aux), (g_x, g_p) = vgrad(
                xs_tree, step_params, ext_inputs, loss_kwargs
            )
        else:
            (overall, aux), (g_x,) = vgrad(
                xs_tree, step_params, ext_inputs, loss_kwargs
            )
            g_p = None

        active = jnp.logical_not(carry["stopped"]) if cfg.early_stop_fn else True

        # early stop predicate, evaluated on this step's pre-update values
        # (reference pc_trainer.py:845: eval happens after computing overall,
        # before the updates — updates at the stop step still run).
        if cfg.early_stop_fn is not None:
            stop_now = jnp.logical_and(
                cfg.early_stop_fn(
                    t=xt["t"],
                    loss=aux["loss"],
                    energy=aux["energy"],
                    overall=overall,
                ),
                active,
            )
        else:
            stop_now = False

        # -- x update ---------------------------------------------------------
        do_any_x = seg.update_x_mask is None or any(seg.update_x_mask)
        if do_any_x:
            updates, new_sx = opt_x.update(g_x, carry["opt_x_state"], xs_tree)
            # lr_scale applies always (not just under dynamic annealing) so
            # PCTrainer.set_x_lr takes effect like the reference's
            # param_groups['lr'] mutation (pc_trainer.py:283-287)
            updates = tree_scale(updates, carry["lr_scale"])
            if seg.update_x_mask is None and cfg.early_stop_fn is None:
                # hot path: every step updates, no masking needed
                xs_new = optax.apply_updates(xs_tree, updates)
                sx_new = new_sx
            else:
                do = xt.get("m_x", True)
                if cfg.early_stop_fn is not None:
                    do = jnp.logical_and(do, active)
                xs_new = tree_select(do, optax.apply_updates(xs_tree, updates), xs_tree)
                sx_new = tree_select(do, new_sx, carry["opt_x_state"])
            carry_opt_x = sx_new
            xs_tree = xs_new
        else:
            carry_opt_x = carry["opt_x_state"]

        # -- dynamic x-lr (after the x step; reference pc_trainer.py:881-901) --
        lr_scale = carry["lr_scale"]
        if cfg.dynamic_x_lr and do_any_x:
            decreased = overall < carry["prev_overall"]
            factor = jnp.where(decreased, cfg.x_lr_amplifier, cfg.x_lr_discount)
            do = xt.get("m_x", True)
            apply_lr = jnp.logical_and(xt["t"] >= 1, do)
            if cfg.early_stop_fn is not None:
                apply_lr = jnp.logical_and(apply_lr, active)
            lr_scale = jnp.where(apply_lr, lr_scale * factor, lr_scale)

        # -- Langevin noise (the random_step callback, utils/model.py:35-44) --
        if noise_std is not None:
            latents = xs_tree["latents"]
            n_keys = jax.random.split(k_noise, len(latents))
            # The reference draws grad ~ N(0, var/lr0) and applies it through
            # optimizer.step() at the CURRENT param-group lr (model.py:43 reads
            # defaults['lr']; the step uses group['lr']), so under set_x_lr or
            # dynamic annealing the effective std is sqrt(lr0*var) * lr_t/lr0.
            # random_step runs AFTER this iteration's annealing
            # (pc_trainer.py:881-918), hence the post-anneal scale.
            std = noise_std * lr_scale
            noise = tuple(
                std * jax.random.normal(nk, x.shape, x.dtype)
                for nk, x in zip(n_keys, latents)
            )
            if cfg.early_stop_fn is not None:
                noise = tree_scale(noise, active.astype(latents[0].dtype))
            xs_tree = dict(xs_tree, latents=tree_add(latents, noise))

        # -- dense in-scan parameter update -------------------------------------
        if dense_p:
            g_scaled = tree_scale(g_p, 1.0 / batch_size)
            p_updates, new_sp = opt_p.update(
                g_scaled, carry["opt_p_state"], step_params
            )
            new_params = optax.apply_updates(step_params, p_updates)
        else:
            new_params = None

        # -- parameter-grad accumulation ---------------------------------------
        pgrad = carry.get("pgrad")
        if seg.with_p_grads and pgrad is not None:
            m_z = xt.get("m_z", False)
            if cfg.early_stop_fn is not None:
                # zero also fires at the stop step when the stop-update is on
                # and the step is outside the accumulation window
                # (reference pc_trainer.py:852-855).
                in_acc = xt.get("m_acc", False)
                m_z = jnp.logical_or(
                    m_z,
                    jnp.logical_and(
                        jnp.logical_and(stop_now, cfg.update_p_at_early_stop),
                        jnp.logical_not(in_acc),
                    ),
                )
                m_z = jnp.logical_and(m_z, active)
                g_p = tree_scale(g_p, active.astype(jnp.float32))
            pgrad = tree_select(m_z, tree_zeros_like(pgrad), pgrad)
            pgrad = tree_add(pgrad, g_p)

        new_carry = {
            "xs_tree": xs_tree,
            "opt_x_state": carry_opt_x,
            "lr_scale": lr_scale,
            "prev_overall": overall,
            "key": key,
        }
        if dense_p:
            new_carry["params"] = new_params
            new_carry["opt_p_state"] = new_sp
        if pgrad is not None:
            new_carry["pgrad"] = pgrad
        if cfg.early_stop_fn is not None:
            stopped = jnp.logical_or(carry["stopped"], stop_now)
            stop_t = jnp.where(
                jnp.logical_and(stop_now, carry["stop_t"] < 0),
                xt["t"],
                carry["stop_t"],
            )
            new_carry["stopped"] = stopped
            new_carry["stop_t"] = stop_t
        else:
            new_carry["stopped"] = carry["stopped"]
            new_carry["stop_t"] = carry["stop_t"]

        ys = {
            "loss": aux["loss"],
            "energy": aux["energy"],
            "overall": overall,
            "x_lr_scale": lr_scale,
        }
        if cfg.capture_outputs:
            ys["outputs"] = aux["outputs"]
        if cfg.capture_representations:
            ys["representations"] = carry["xs_tree"]["latents"][cfg.rep_index]
        if cfg.capture_xs:
            ys["xs"] = carry["xs_tree"]["latents"]
        if cfg.capture_overall_elementwise:
            ys["overall_elementwise"] = aux["overall_elementwise"]
        return new_carry, ys

    # per-step scan inputs
    ts = jnp.arange(seg.start, seg.start + seg.length, dtype=jnp.int32)
    xs: dict = {"t": ts}
    if seg.update_x_mask is not None:
        xs["m_x"] = jnp.asarray(seg.update_x_mask)
    if seg.p_zero_mask is not None:
        xs["m_z"] = jnp.asarray(seg.p_zero_mask)
    if cfg.early_stop_fn is not None and acc_set:
        xs["m_acc"] = jnp.asarray(
            [t in acc_set for t in range(seg.start, seg.start + seg.length)]
        )

    stride = cfg.capture_stride
    if stride > 1:
        # Thinned capture anchored at the GLOBAL step index: a step is
        # captured iff t % stride == 0 (t = seg.start + local index), so that
        # the per-segment captures concatenate to exactly
        # full_capture[::stride] regardless of where segment boundaries fall
        # (the reference's slicing convention, utils/model.py:158, and the
        # Pallas kernel's t % stride == 0 timing).  Layout per segment:
        #   [lead steps, discarded] [n_full chunks of stride, first emitted]
        #   [rem steps, first emitted]   (lead = (-start) % stride)
        lead = (-seg.start) % stride
        if lead >= seg.length:
            # no aligned capture point falls inside this segment
            carry, ys = jax.lax.scan(step, carry, xs)
            ys = jax.tree_util.tree_map(lambda a: a[:0], ys)
            return carry, ys
        if lead:
            xs_lead = jax.tree_util.tree_map(lambda a: a[:lead], xs)
            carry, _ = jax.lax.scan(step, carry, xs_lead)
        n_full = (seg.length - lead) // stride
        rem = seg.length - lead - n_full * stride
        xs_main = jax.tree_util.tree_map(
            lambda a: a[lead : lead + n_full * stride].reshape(
                (n_full, stride) + a.shape[1:]
            ),
            xs,
        )

        def outer(carry, xt_chunk):
            def inner(c, xt):
                c, y = step(c, xt)
                return c, y

            carry, ys_chunk = jax.lax.scan(inner, carry, xt_chunk)
            ys_first = jax.tree_util.tree_map(lambda a: a[0], ys_chunk)
            return carry, ys_first

        carry, ys = jax.lax.scan(outer, carry, xs_main)
        if rem:
            xs_rem = jax.tree_util.tree_map(
                lambda a: a[lead + n_full * stride :], xs
            )
            carry, ys_rem = jax.lax.scan(step, carry, xs_rem)
            ys = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b[:1]], axis=0), ys, ys_rem
            )
        return carry, ys

    return jax.lax.scan(step, carry, xs)


def build_train_on_batch(model: PCModel, cfg: EngineConfig):
    """Build the pure, jittable train_on_batch function for a static config.

    Returns a function
        fn(state: EngineState, inputs, loss_kwargs) ->
            (EngineState, results dict)
    """
    opt_x = cfg.optimizer_x.make()
    opt_p = cfg.optimizer_p.make() if cfg.optimizer_p is not None else None
    needs_pgrad = any(s.with_p_grads for s in cfg.plan.segments) and opt_p is not None

    def fn(state: EngineState, inputs, loss_kwargs):
        params = state.params
        xs_tree = {"latents": state.latents}
        if cfg.optimize_inputs:
            xs_tree["inputs"] = inputs

        carry = {
            "xs_tree": xs_tree,
            "opt_x_state": state.opt_x_state,
            "lr_scale": state.lr_scale,
            "prev_overall": jnp.zeros(()),
            "key": state.key,
            "stopped": jnp.zeros((), dtype=bool),
            "stop_t": jnp.full((), -1, dtype=jnp.int32),
        }
        if needs_pgrad:
            carry["pgrad"] = tree_zeros_like(params)

        batch_size = inputs.shape[0]
        divisor = float(cfg.plan.p_divisor_steps * batch_size)
        opt_p_state = state.opt_p_state
        p_done = jnp.zeros((), dtype=bool)

        ys_all = []
        for seg in cfg.plan.segments:
            if seg.p_update_every_step and opt_p is not None:
                carry["params"] = params
                carry["opt_p_state"] = opt_p_state
                carry, ys = _run_segment(
                    cfg, model, seg, opt_x, params, carry, inputs,
                    loss_kwargs, opt_p=opt_p, batch_size=batch_size,
                )
                params = carry.pop("params")
                opt_p_state = carry.pop("opt_p_state")
            else:
                carry, ys = _run_segment(
                    cfg, model, seg, opt_x, params, carry, inputs, loss_kwargs
                )
            ys_all.append(ys)

            if seg.p_update_at_end and opt_p is not None:
                # reference pc_trainer.py:904-914: divide grads by
                # len(accumulate)*B (or B), then optimizer_p.step().
                g = tree_scale(carry["pgrad"], 1.0 / divisor)
                updates, new_sp = opt_p.update(g, opt_p_state, params)
                if cfg.early_stop_fn is not None:
                    ok = jnp.logical_or(
                        jnp.logical_not(carry["stopped"]),
                        jnp.logical_and(
                            jnp.asarray(cfg.update_p_at_early_stop),
                            jnp.logical_not(p_done),
                        ),
                    )
                    params = tree_select(
                        ok, optax.apply_updates(params, updates), params
                    )
                    opt_p_state = tree_select(ok, new_sp, opt_p_state)
                    p_done = jnp.logical_or(
                        p_done, jnp.logical_and(carry["stopped"], ok)
                    )
                else:
                    params = optax.apply_updates(params, updates)
                    opt_p_state = new_sp

        # concatenate per-segment ys (keys may differ across segments only in
        # presence of optional captures — they don't, since cfg is global)
        results = jax.tree_util.tree_map(
            lambda *parts: jnp.concatenate(parts, axis=0), *ys_all
        )
        results["stop_t"] = carry["stop_t"]

        new_state = EngineState(
            params=params,
            latents=carry["xs_tree"]["latents"],
            opt_x_state=carry["opt_x_state"],
            opt_p_state=opt_p_state,
            lr_scale=carry["lr_scale"],
            key=carry["key"],
        )
        if cfg.optimize_inputs:
            results["optimized_inputs"] = carry["xs_tree"]["inputs"]
        return new_state, results

    return fn
