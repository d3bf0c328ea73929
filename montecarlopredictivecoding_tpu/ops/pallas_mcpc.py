"""Fused whole-chain MCPC kernel (Pallas, TPU).

The hot loop of the framework — T Langevin steps over the canonical
generative MLP (reference workload: ``pc_trainer.py:712`` loop at
figure_2.py:167-173 scale) — as ONE kernel: weights, latents, the target and
the parameter-gradient accumulators live in VMEM for the entire chain, the
per-step Gaussian noise comes from the on-core PRNG (Box-Muller over
``pltpu.prng_random_bits``), and each step is a handful of MXU matmuls plus
VPU elementwise work.  Zero HBM traffic inside the loop.  Batches larger
than one VMEM-resident tile are grid-tiled over the batch dimension: each
tile runs its full chain, parameter-gradient/scalar accumulators are
revisited (and summed) across the sequential grid steps.

Topology (must match ``make_mlp_model``; act ∈ {relu, tanh}):

    zeros -> Linear(d0,d0) -> PC(x0) -> act -> Linear(d0,d1) -> PC(x1)
          -> act -> Linear(d1,d2) -> PC(x2) -> act -> Linear(d2,D) -> loss

Energy and closed-form gradients (the same math jax.grad derives in the
scan engine — parity-tested against it):

    err_l = x_l - mu_l                      (mu0 = b0: zeros pseudo-input)
    s     = dLoss/dlogits   (Bernoulli: sigmoid(logits) - y;
                             Gaussian: (logits - y)/var;  unclamped: 0)
    dE/dx2 = err2 + act'(x2) * (s @ W3ᵀ)
    dE/dx1 = err1 - act'(x1) * (err2 @ W2ᵀ)
    dE/dx0 = err0 - act'(x0) * (err1 @ W1ᵀ)
    x_l   <- x_l - lr * dE/dx_l + sqrt(lr * var) * eps

Optional Monte-Carlo parameter-gradient accumulation over steps
t >= mixing (the MCPC learning rule, reference pc_trainer.py:848-914):

    gW3 += act(x2)ᵀ s        gb3 += Σ_b s
    gW2 += -act(x1)ᵀ err2    gb2 += -Σ_b err2     (same for layer 1)
    gb0 += -Σ_b err0          (gW0 = 0: zeros input)

The optional Adam warm-start phase covers the reference's PC MAP descent
(utils/model.py:121-131); with ``warm_pgrads`` it also emits the final-step
parameter gradients, i.e. a full PC training step (update_x='all' Adam,
update_p='last', reference training_evaluation.py:16-39) in one dispatch.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.model import PCModel
from ..core.modules import PC, Activation, Linear

_SUPPORTED_ACTS = ("relu", "tanh")


def model_activation(model: PCModel) -> tp.Optional[str]:
    """The model's uniform activation name if kernel-supported, else None."""
    names = {m.name for m in model.modules if isinstance(m, Activation)}
    if len(names) == 1:
        name = names.pop()
        if name in _SUPPORTED_ACTS:
            return name
    return None


_CANONICAL_KINDS = [
    "Linear", "PC", "Activation", "Linear", "PC", "Activation",
    "Linear", "PC", "Activation", "Linear",
]


def supports_model(model: PCModel, activation: tp.Optional[str] = None) -> bool:
    """The kernel covers the canonical 4-Linear MLP with 3 PC sites, a
    uniform relu/tanh activation, the default Gaussian energy and no S/M
    masks.  Pass ``activation`` to require a specific one."""
    from ..core.modules import gaussian_energy

    kinds = [type(m).__name__ for m in model.modules]
    if kinds != _CANONICAL_KINDS:
        return False
    act = model_activation(model)
    if act is None or (activation is not None and act != activation):
        return False
    # the kernel's closed-form gradients assume 0.5*(mu-x)^2 everywhere
    return all(
        m.energy_fn is gaussian_energy and m.S is None and m.M is None
        for m in model.modules
        if isinstance(m, PC)
    )


def output_pc_var(model: PCModel) -> tp.Optional[float]:
    """If ``model`` is the canonical MLP with a TRAILING PC site (the
    "generative PCLayer at the output" pattern, reference figure_3.py:47-55
    / make_mlp_model(output_pc=...)), return the trailing site's Gaussian
    variance; otherwise None.  The trailing energy must be a (scaled)
    Gaussian (``gaussian_var`` attribute) with no S/M masks; the hidden
    sites must satisfy the standard eligibility."""
    from ..core.modules import gaussian_energy

    kinds = [type(m).__name__ for m in model.modules]
    if kinds != _CANONICAL_KINDS + ["PC"]:
        return None
    if model_activation(model) is None:
        return None
    hidden = model.pc_layers[:-1]
    if not all(
        m.energy_fn is gaussian_energy and m.S is None and m.M is None
        for m in hidden
    ):
        return None
    tail = model.pc_layers[-1]
    var = getattr(tail.energy_fn, "gaussian_var", None)
    if var is None or tail.S is not None or tail.M is not None:
        return None
    return float(var)


# Scoped-VMEM ceiling for the chain kernel.  The Mosaic default (16 MiB)
# is sized for kernels that share the core; this kernel owns the chip for
# the whole chain, so let it use most of the v5e's 128 MiB — the fully
# loaded capture+pgrads+scalars variant needs ~16.5 MiB at tile 1024 on
# the fid architecture and ~2x that on the wider mse architecture.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _pick_batch_tile(B: int, cap: int = 1024) -> int:
    """Largest divisor of B that fits one VMEM-resident tile (<= cap)."""
    if B <= cap:
        return B
    for t in range(cap, 0, -1):
        if B % t == 0:
            return t
    return B


def _traj_scalar_rows(traj, params_flat, target, dims, activation, loss,
                      inv_var):
    """Pre-update loss/energy sums for each captured step, recomputed from
    the packed latent trajectory (the same forward the engine runs per step,
    pc_trainer.py:777-795).  ``traj`` is [n_cap, B, d0+d1+d2];
    ``params_flat`` = (b0, w1, b1, w2, b2, w3, b3).  Returns
    ([n_cap] loss, [n_cap] energy)."""
    b0, w1, b1, w2, b2, w3, b3 = params_flat
    d0, d1, d2, D = dims
    x0 = traj[:, :, 0:d0]
    x1 = traj[:, :, d0 : d0 + d1]
    x2 = traj[:, :, d0 + d1 :]
    act = (lambda v: jnp.maximum(v, 0.0)) if activation == "relu" else jnp.tanh
    # full-f32 MXU passes: the TPU bf16 default would give these scalar rows
    # ~2^-8 relative error while the kernel-emitted final row is full f32
    hi = jax.lax.Precision.HIGHEST
    err0 = x0 - b0
    err1 = x1 - (jnp.matmul(act(x0), w1, precision=hi) + b1)
    err2 = x2 - (jnp.matmul(act(x1), w2, precision=hi) + b2)
    logits = jnp.matmul(act(x2), w3, precision=hi) + b3
    energy = 0.5 * (
        jnp.sum(err0 * err0, axis=(1, 2))
        + jnp.sum(err1 * err1, axis=(1, 2))
        + jnp.sum(err2 * err2, axis=(1, 2))
    )
    if loss == "bernoulli":
        y = target[None, :, :]
        loss_v = jnp.sum(
            jnp.maximum(logits, 0.0)
            - logits * y
            + jnp.log1p(jnp.exp(-jnp.abs(logits))),
            axis=(1, 2),
        )
    elif loss == "gaussian":
        loss_v = 0.5 * inv_var * jnp.sum(
            (logits - target[None, :, :]) ** 2, axis=(1, 2)
        )
    else:
        loss_v = jnp.zeros(traj.shape[0], jnp.float32)
    return loss_v, energy


def _normals(shape):
    """Standard normals via Box-Muller over on-core random bits, using both
    the cos and sin branches so each (log, sqrt) pair yields two normals."""
    rows, cols = shape
    half = (cols + 1) // 2
    b1 = pltpu.prng_random_bits((rows, half))
    b2 = pltpu.prng_random_bits((rows, half))
    # mask to 24 low bits (int32-safe: result is non-negative), then scale to
    # uniforms in (0, 1]
    u1 = (b1 & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    u2 = (b2 & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = 2.0 * np.pi * u2
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)
    return z[:, :cols]


def _make_packed_kernel(T: int, mixing: int, lr: float, noise_std: float,
                        loss: str, inv_var: float, with_pgrads: bool,
                        dims: tuple, bf16_matmul: bool = True,
                        warm: tp.Optional[tuple] = None,
                        capture_stride: int = 0,
                        activation: str = "relu",
                        warm_pgrads: bool = False,
                        emit_scalars: bool = False,
                        emit_warm_opt_state: bool = False,
                        tile_B: int = 0,
                        output_pc: bool = False):
    """Packed variant: one block-diagonal matmul per direction per step.

    All PC-site predictions depend only on the *current* latents, so the
    forward projections mu1/mu2/logits fuse into a single
    ``act(X) @ blockdiag(W1, W2, W3)`` with X = [x0 | x1 | x2], and the
    backward projections into one matmul against its transpose.  This trades
    ~3x extra (zero-block) FLOPs for ~5x fewer MXU dispatches — a win because
    the small per-layer matmuls are latency-bound, not FLOP-bound.
    """
    d0, d1, d2, D = dims
    c0, c1, c2 = 0, d0, d0 + d1  # column offsets of x0/x1/x2 in X
    xw = d0 + d1 + d2            # total latent width
    o1_, o2_, o3_ = 0, d1, d1 + d2  # column offsets of mu1/mu2/logits
    ow = d1 + d2 + D
    xw_pad = -(-xw // 128) * 128

    def kernel(
        seed_ref,  # SMEM [1]
        wf, b0, b_cat,  # packed params: blockdiag fwd weights, prior bias, cat biases
        x_in,  # packed latents tile [tile_B, xw]
        y,  # target tile [tile_B, D]; with output_pc this is x3_in (the
            # trailing PC site's latent — the sensory layer itself)
        x_out,  # packed latents out tile
        *rest,  # outputs: [x3_out] when output_pc, then [m_out, v_out] when
                # emit_warm_opt_state, then [gw_full, gb_cat, gb0] when
                # with_pgrads, then [scal] when emit_scalars, then
                # [traj (HBM)] when capture_stride > 0;
                # scratch: [cap_buf, dma_sem]
    ):
        k = 0
        if output_pc:
            x3_out = rest[0]  # trailing latent tile [tile_B, D]
            k = 1
        if emit_warm_opt_state:
            m_out, v_out = rest[k : k + 2]  # final Adam moments [tile_B, xw]
            k += 2
        if with_pgrads:
            gw_full, gb_cat, gb0 = rest[k : k + 3]
            k += 3
        if emit_scalars:
            scal = rest[k]  # VMEM [1, 128]: final-step pre-update loss/energy
            k += 1
        if capture_stride > 0:
            traj_ref = rest[k]       # HBM [n_cap, B, xw_pad]
            cap_buf = rest[k + 1]    # VMEM staging [tile_B, xw_pad]
            dma_sem = rest[k + 2]
        tile_i = pl.program_id(0)
        if noise_std > 0.0:  # seeding is TPU-only; skip on deterministic runs
            # decorrelate the noise streams of the batch tiles
            pltpu.prng_seed(seed_ref[0] + tile_i)

        # accumulators are revisited across the sequential batch-tile grid:
        # zero them only on the first tile
        @pl.when(tile_i == 0)
        def _():
            if with_pgrads:
                gw_full[...] = jnp.zeros_like(gw_full)
                gb_cat[...] = jnp.zeros_like(gb_cat)
                gb0[...] = jnp.zeros_like(gb0)
            if emit_scalars:
                scal[...] = jnp.zeros_like(scal)

        x_out[...] = x_in[...]
        if output_pc:
            x3_out[...] = y[...]

        def mm(a, b):
            if bf16_matmul:
                a = a.astype(jnp.bfloat16)
                b = b.astype(jnp.bfloat16)
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def act(X):
            if activation == "relu":
                return jnp.maximum(X, 0.0)
            return jnp.tanh(X)

        def grads_and_V(X):
            """Energy gradient w.r.t. the packed latents, plus the packed
            backward vector V = [err1 | err2 | -s], H = act(X) (reused for
            the Hebbian parameter grads), err_cat/logits (reused for the
            scalar loss/energy emission), and — with output_pc — the
            trailing site's error err3 = x3 - logits."""
            H = act(X)
            if activation == "relu":
                dH = jnp.where(X > 0, 1.0, 0.0)
            else:  # tanh' = 1 - tanh^2
                dH = 1.0 - H * H
            MU = mm(H, wf[...]) + b_cat[...][None, :]  # [B, d1+d2+D]

            err0 = X[:, c1 - d0 : c1] - b0[...][None, :]
            err1 = X[:, c1 : c1 + d1] - MU[:, o1_ : o1_ + d1]
            err2 = X[:, c2 : c2 + d2] - MU[:, o2_ : o2_ + d2]
            logits = MU[:, o3_ : o3_ + D]

            err3 = None
            if output_pc:
                # trailing PC site: the sensory layer is an unclamped latent
                # with energy 0.5*inv_var*(x3 - logits)^2 — its dE/dlogits
                # has exactly the Gaussian-loss form with y := x3
                err3 = x3_out[...] - logits
                s = -err3 * inv_var
            elif loss == "bernoulli":
                s = jax.nn.sigmoid(logits) - y[...]
            elif loss == "gaussian":
                s = (logits - y[...]) * inv_var
            else:
                s = jnp.zeros_like(logits)

            # V @ wfᵀ = [err1@W1ᵀ | err2@W2ᵀ | -s@W3ᵀ]
            V = jnp.concatenate([err1, err2, -s], axis=1)
            back = mm(V, wf[...].T)  # [B, xw]
            err_cat = jnp.concatenate([err0, err1, err2], axis=1)
            G = err_cat - dH * back
            return G, V, H, err0, err_cat, logits, err3

        def scal_row(err_cat, logits, err3=None):
            """[1, 128] row: lane 0 = sensory loss, lane 1 = layer energy —
            both batch-tile sums (accumulated across tiles), computed from
            the PRE-update state (the engine/reference scalar convention,
            pc_trainer.py:777-795).  Only the FINAL step's row is emitted
            from the kernel; per-captured-step scalars are recomputed from
            the HBM trajectory outside the kernel (mcpc_chain_pallas), which
            keeps the hot loop free of the O(n_cap) masked accumulator."""
            energy_s = 0.5 * jnp.sum(err_cat * err_cat)
            if output_pc:
                energy_s += 0.5 * inv_var * jnp.sum(err3 * err3)
            if loss == "bernoulli":
                loss_s = jnp.sum(
                    jnp.maximum(logits, 0.0)
                    - logits * y[...]
                    + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                )
            elif loss == "gaussian":
                loss_s = 0.5 * inv_var * jnp.sum((logits - y[...]) ** 2)
            else:
                loss_s = jnp.zeros(())
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            return jnp.where(
                lane == 0, loss_s, jnp.where(lane == 1, energy_s, 0.0)
            )

        def accum_pgrads(V, H, err0):
            # Hᵀ @ [-err1 | -err2 | s]: diagonal blocks = grads
            gw_full[...] += mm(H.T, -V)
            gb_cat[...] += jnp.sum(-V, axis=0)
            gb0[...] += jnp.sum(-err0, axis=0)

        def body(m_ref, v_ref):
            # -- optional Adam MAP warm start (the reference's PC phase:
            # utils/model.py:121-131 runs T_pc Adam steps on the latents
            # before the Langevin chain) -----------------------------------
            if warm is not None:
                warm_T, warm_lr, wb1, wb2, weps = warm
                m_ref[...] = jnp.zeros_like(m_ref)
                v_ref[...] = jnp.zeros_like(v_ref)

                def warm_step(t, carry):
                    # bias-correction powers carried incrementally — Mosaic
                    # has no powf with a traced exponent
                    b1p, b2p = carry
                    X = x_out[...]
                    G, V, H, err0, err_cat, logits, _ = grads_and_V(X)
                    if warm_pgrads:
                        # PC training: update_p='last' takes the final
                        # step's pre-update gradients (pc_trainer.py:904-914)
                        @pl.when(t == warm_T - 1)
                        def _():
                            accum_pgrads(V, H, err0)
                    if emit_scalars and T == 0:
                        # pure-PC chain: the last pre-update scalars come
                        # from the warm phase's final step
                        @pl.when(t == warm_T - 1)
                        def _():
                            scal[...] += scal_row(err_cat, logits)
                    m = wb1 * m_ref[...] + (1.0 - wb1) * G
                    v = wb2 * v_ref[...] + (1.0 - wb2) * G * G
                    m_ref[...] = m
                    v_ref[...] = v
                    mhat = m / (1.0 - b1p)
                    vhat = v / (1.0 - b2p)
                    x_out[...] = X - warm_lr * mhat / (jnp.sqrt(vhat) + weps)
                    return (b1p * wb1, b2p * wb2)

                jax.lax.fori_loop(
                    0, warm_T, warm_step,
                    (jnp.float32(wb1), jnp.float32(wb2)),
                )
                if emit_warm_opt_state:
                    # final Adam moments, so the trainer can hand the
                    # optimizer-x state to the engine for continuation calls
                    # (reference semantics: the optimizer object persists
                    # across train_on_batch calls, pc_trainer.py:741-752)
                    m_out[...] = m_ref[...]
                    v_out[...] = v_ref[...]

            # -- Langevin phase ---------------------------------------------
            def step(t, _):
                X = x_out[...]

                if capture_stride > 0:
                    # record the pre-update latents every stride steps
                    # (matches the engine's capture timing); staged through a
                    # 128-aligned VMEM buffer — DMA slices must be
                    # lane-aligned
                    @pl.when(t % capture_stride == 0)
                    def _():
                        cap_buf[:, 0:xw] = X
                        slot = t // capture_stride
                        cp = pltpu.make_async_copy(
                            cap_buf,
                            traj_ref.at[slot, pl.ds(tile_i * tile_B, tile_B)],
                            dma_sem,
                        )
                        cp.start()
                        cp.wait()

                G, V, H, err0, err_cat, logits, err3 = grads_and_V(X)

                if emit_scalars:
                    @pl.when(t == T - 1)
                    def _():
                        scal[...] += scal_row(err_cat, logits, err3)

                if with_pgrads:
                    @pl.when(t >= mixing)
                    def _():
                        accum_pgrads(V, H, err0)

                if noise_std > 0.0:
                    x_out[...] = X - lr * G + noise_std * _normals(X.shape)
                else:
                    x_out[...] = X - lr * G
                if output_pc:
                    # trailing latent's Langevin step: dE/dx3 = inv_var*err3
                    g3 = inv_var * err3
                    if noise_std > 0.0:
                        x3_out[...] = (
                            x3_out[...] - lr * g3
                            + noise_std * _normals((x3_out.shape[0], D))
                        )
                    else:
                        x3_out[...] = x3_out[...] - lr * g3
                return ()

            jax.lax.fori_loop(0, T, step, ())

        if warm is not None:
            pl.run_scoped(
                body,
                m_ref=pltpu.VMEM(x_in.shape, jnp.float32),
                v_ref=pltpu.VMEM(x_in.shape, jnp.float32),
            )
        else:
            body(None, None)

    return kernel


def _make_kernel(T: int, mixing: int, lr: float, noise_std: float,
                 loss: str, inv_var: float, with_pgrads: bool,
                 bf16_matmul: bool = True):
    """Unpacked reference variant (relu-only, single tile): one matmul per
    layer per direction — kept as the readable baseline the packed kernel is
    parity-tested against."""
    def kernel(
        seed_ref,  # SMEM [1]
        w0, b0, w1, b1, w2, b2, w3, b3,  # params (VMEM)
        x0, x1, x2,  # latents in
        y,  # target
        o0, o1, o2,  # latents out
        *rest,  # pgrad outputs when with_pgrads: gw1 gb1 gw2 gb2 gw3 gb3 gb0
    ):
        if noise_std > 0.0:  # seeding is TPU-only; skip on deterministic runs
            pltpu.prng_seed(seed_ref[0])

        if with_pgrads:
            gw1, gb1, gw2, gb2, gw3, gb3, gb0 = rest
            gw1[...] = jnp.zeros_like(gw1)
            gb1[...] = jnp.zeros_like(gb1)
            gw2[...] = jnp.zeros_like(gw2)
            gb2[...] = jnp.zeros_like(gb2)
            gw3[...] = jnp.zeros_like(gw3)
            gb3[...] = jnp.zeros_like(gb3)
            gb0[...] = jnp.zeros_like(gb0)

        o0[...] = x0[...]
        o1[...] = x1[...]
        o2[...] = x2[...]

        # optionally run the MXU in bfloat16 with float32 accumulation —
        # the latent/parameter state stays float32
        def mm(a, b):
            if bf16_matmul:
                a = a.astype(jnp.bfloat16)
                b = b.astype(jnp.bfloat16)
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def step(t, _):
            x0v, x1v, x2v = o0[...], o1[...], o2[...]

            # forward: predictions and errors
            err0 = x0v - b0[...][None, :]
            h0 = jnp.maximum(x0v, 0.0)
            mu1 = mm(h0, w1[...]) + b1[...][None, :]
            err1 = x1v - mu1
            h1 = jnp.maximum(x1v, 0.0)
            mu2 = mm(h1, w2[...]) + b2[...][None, :]
            err2 = x2v - mu2
            h2 = jnp.maximum(x2v, 0.0)
            logits = mm(h2, w3[...]) + b3[...][None, :]

            if loss == "bernoulli":
                s = jax.nn.sigmoid(logits) - y[...]
            elif loss == "gaussian":
                s = (logits - y[...]) * inv_var
            else:  # unclamped
                s = jnp.zeros_like(logits)

            # latent gradients (backward through one layer each)
            g2 = err2 + jnp.where(x2v > 0, 1.0, 0.0) * mm(s, w3[...].T)
            g1 = err1 - jnp.where(x1v > 0, 1.0, 0.0) * mm(err2, w2[...].T)
            g0 = err0 - jnp.where(x0v > 0, 1.0, 0.0) * mm(err1, w1[...].T)

            # parameter-gradient accumulation over the sampling window
            if with_pgrads:
                @pl.when(t >= mixing)
                def _():
                    gw3[...] += mm(h2.T, s)
                    gb3[...] += jnp.sum(s, axis=0)
                    gw2[...] += mm(h1.T, -err2)
                    gb2[...] += jnp.sum(-err2, axis=0)
                    gw1[...] += mm(h0.T, -err1)
                    gb1[...] += jnp.sum(-err1, axis=0)
                    gb0[...] += jnp.sum(-err0, axis=0)

            # Langevin update
            if noise_std > 0.0:
                n0 = _normals(x0v.shape)
                n1 = _normals(x1v.shape)
                n2 = _normals(x2v.shape)
                o0[...] = x0v - lr * g0 + noise_std * n0
                o1[...] = x1v - lr * g1 + noise_std * n1
                o2[...] = x2v - lr * g2 + noise_std * n2
            else:
                o0[...] = x0v - lr * g0
                o1[...] = x1v - lr * g1
                o2[...] = x2v - lr * g2
            return ()

        jax.lax.fori_loop(0, T, step, ())

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "T", "mixing", "lr", "noise_var", "loss", "input_var",
        "with_pgrads", "interpret", "bf16_matmul", "packed",
        "warm_T", "warm_lr", "warm_b1", "warm_b2", "warm_eps",
        "capture_stride", "activation", "warm_pgrads", "return_scalars",
        "batch_tile", "emit_warm_opt_state", "output_var",
    ),
)
def mcpc_chain_pallas(
    params: tuple,
    latents: tuple,
    target: jax.Array,
    seed: jax.Array,
    *,
    T: int,
    lr: float,
    noise_var: tp.Optional[float] = 2.0,
    loss: str = "bernoulli",  # 'bernoulli' | 'gaussian' | 'none'
    input_var: float = 1.0,
    mixing: int = 0,
    with_pgrads: bool = False,
    interpret: bool = False,
    bf16_matmul: bool = False,
    packed: bool = True,
    warm_T: int = 0,
    warm_lr: float = 0.1,
    warm_b1: float = 0.9,
    warm_b2: float = 0.999,
    warm_eps: float = 1e-8,
    capture_stride: int = 0,
    activation: str = "relu",
    warm_pgrads: bool = False,
    return_scalars: bool = False,
    batch_tile: tp.Optional[int] = None,
    emit_warm_opt_state: bool = False,
    output_var: tp.Optional[float] = None,
):
    """Run (optionally) warm_T Adam MAP steps then T fused MCPC steps.

    Returns ``(latents', pgrads_or_None)``, appending — in order — ``traj``
    when ``capture_stride > 0`` (packed pre-update latents every stride
    Langevin steps, shape [ceil(T/stride), B, d0+d1+d2], DMA'd to HBM from
    inside the chain), ``scalars`` when ``return_scalars``
    (``{"loss": [R], "energy": [R]}`` batch sums with R = n_captures + 1;
    rows 0..R-2 are the captured steps' PRE-update values, row R-1 is the
    final step's pre-update value — the engine/reference convention,
    pc_trainer.py:777-795; the capture rows are recomputed in f32 from the
    trajectory outside the kernel), and ``(m, v)`` packed final Adam moments
    when ``emit_warm_opt_state`` (for handing optimizer-x state back to the
    engine on continuation calls).

    Batches larger than one VMEM tile are grid-tiled over the batch
    (``batch_tile``; default: largest divisor of B ≤ 1024); accumulators sum
    across tiles, noise streams are decorrelated per tile.

    With ``warm_pgrads`` (requires warm_T > 0) the warm phase's final step
    also accumulates parameter gradients — ``T=0`` then gives a complete PC
    training step (Adam on x every step, p-update from the last step).

    pgrads mirror the params structure (gw0 is zeros — the pseudo-input is
    zeros so the first weight never receives gradient, matching the engine).
    """
    w0, w1, w2, w3 = (p["w"] for p in params)
    b0, b1, b2, b3 = (p["b"] for p in params)
    output_pc = output_var is not None
    if output_pc:
        if len(latents) != 4:
            raise ValueError("output_var requires 4 latents (trailing PC)")
        if loss != "none":
            raise ValueError(
                "output_var models are unclamped joint samplers (loss='none')"
            )
        if warm_T or capture_stride or not packed:
            raise ValueError(
                "output_var supports the packed Langevin phase only (no "
                "warm start / capture yet — the engine covers those)"
            )
        x3 = latents[3]
        latents = latents[:3]
    x0, x1, x2 = latents
    B = x0.shape[0]
    noise_std = float(np.sqrt(lr * noise_var)) if noise_var else 0.0
    if warm_T and not packed:
        raise ValueError("the Adam warm-start phase requires packed=True")
    if warm_pgrads and not warm_T:
        raise ValueError("warm_pgrads requires warm_T > 0")
    if emit_warm_opt_state and not warm_T:
        raise ValueError("emit_warm_opt_state requires warm_T > 0")
    if activation != "relu" and not packed:
        raise ValueError("packed=False supports relu only")
    if capture_stride > 0 and T == 0:
        raise ValueError("capture_stride requires a Langevin phase (T > 0)")

    if packed:
        d0, d1, d2 = x0.shape[1], x1.shape[1], x2.shape[1]
        D = w3.shape[1]
        dims = (d0, d1, d2, D)
        xw, ow = d0 + d1 + d2, d1 + d2 + D
        wf = jnp.zeros((xw, ow), jnp.float32)
        wf = wf.at[0:d0, 0:d1].set(w1)
        wf = wf.at[d0 : d0 + d1, d1 : d1 + d2].set(w2)
        wf = wf.at[d0 + d1 :, d1 + d2 :].set(w3)
        b_cat = jnp.concatenate([b1, b2, b3])
        X = jnp.concatenate([x0, x1, x2], axis=1)

        tile = _pick_batch_tile(B) if batch_tile is None else int(batch_tile)
        if B % tile != 0:
            raise ValueError(f"batch {B} not divisible by batch_tile {tile}")
        if batch_tile is None and B > tile and tile < 128:
            raise ValueError(
                f"batch {B} has no VMEM-tile divisor >= 128 (best: {tile}); "
                "a sub-sublane tile would serialize the chain ~B times — pad "
                "the batch to a multiple of 128 or pass batch_tile explicitly"
            )
        n_tiles = B // tile
        n_cap = -(-T // capture_stride) if capture_stride > 0 else 0

        kernel = _make_packed_kernel(
            T=T, mixing=mixing, lr=lr, noise_std=noise_std,
            loss=loss,
            inv_var=(1.0 / output_var) if output_pc else (1.0 / input_var),
            with_pgrads=with_pgrads,
            dims=dims, bf16_matmul=bf16_matmul,
            warm=(warm_T, warm_lr, warm_b1, warm_b2, warm_eps)
            if warm_T > 0
            else None,
            capture_stride=capture_stride,
            activation=activation,
            warm_pgrads=warm_pgrads,
            emit_scalars=return_scalars,
            emit_warm_opt_state=emit_warm_opt_state,
            tile_B=tile,
            output_pc=output_pc,
        )
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        row_block = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0))
        out_shapes = [jax.ShapeDtypeStruct((B, xw), jnp.float32)]
        out_specs = [row_block(xw)]
        if output_pc:
            out_shapes.append(jax.ShapeDtypeStruct((B, D), jnp.float32))
            out_specs.append(row_block(D))
        if emit_warm_opt_state:
            out_shapes += [jax.ShapeDtypeStruct((B, xw), jnp.float32)] * 2
            out_specs += [row_block(xw)] * 2
        if with_pgrads:
            out_shapes += [
                jax.ShapeDtypeStruct((xw, ow), jnp.float32),
                jax.ShapeDtypeStruct((ow,), jnp.float32),
                jax.ShapeDtypeStruct((d0,), jnp.float32),
            ]
            out_specs += [vmem] * 3
        if return_scalars:
            out_shapes.append(jax.ShapeDtypeStruct((1, 128), jnp.float32))
            out_specs.append(vmem)
        xw_pad = -(-xw // 128) * 128  # DMA slices must be lane-aligned
        scratch = []
        if capture_stride > 0:
            out_shapes.append(
                jax.ShapeDtypeStruct((n_cap, B, xw_pad), jnp.float32)
            )
            out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
            scratch.append(pltpu.VMEM((tile, xw_pad), jnp.float32))
            scratch.append(pltpu.SemaphoreType.DMA(()))
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [vmem] * 3
            + [row_block(xw), row_block(D)],
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(
            jnp.asarray(seed, dtype=jnp.int32).reshape(1),
            wf, b0, b_cat,
            X,
            # the y operand carries x3 for output-PC joint samplers
            x3 if output_pc
            else (target if target is not None else jnp.zeros((B, D), jnp.float32)),
        )
        Xo = outs[0]
        new_latents = (Xo[:, 0:d0], Xo[:, d0 : d0 + d1], Xo[:, d0 + d1 :])
        pgrads = None
        k = 1
        if output_pc:
            new_latents = new_latents + (outs[k],)
            k += 1
        warm_mv = None
        if emit_warm_opt_state:
            warm_mv = (outs[k], outs[k + 1])
            k += 2
        if with_pgrads:
            gw_full, gb_cat, gb0 = outs[k : k + 3]
            k += 3
            pgrads = (
                {"w": jnp.zeros_like(w0), "b": gb0},
                {"w": gw_full[0:d0, 0:d1], "b": gb_cat[0:d1]},
                {"w": gw_full[d0 : d0 + d1, d1 : d1 + d2], "b": gb_cat[d1 : d1 + d2]},
                {"w": gw_full[d0 + d1 :, d1 + d2 :], "b": gb_cat[d1 + d2 :]},
            )
        final_row = None
        if return_scalars:
            scal = outs[k]
            k += 1
            final_row = {"loss": scal[:, 0], "energy": scal[:, 1]}
        traj = None
        if capture_stride > 0:
            traj = outs[k][:, :, :xw]
        scalars = None
        if return_scalars:
            if traj is not None:
                # per-captured-step pre-update scalars, recomputed in f32
                # from the trajectory — same math as the engine's per-step
                # loss/energy (one batched forward over all captures; keeps
                # the chain kernel free of per-step scalar accumulators)
                cap = _traj_scalar_rows(
                    traj, (b0, w1, b1, w2, b2, w3, b3), target, dims,
                    activation, loss, 1.0 / input_var,
                )
                scalars = {
                    "loss": jnp.concatenate([cap[0], final_row["loss"]]),
                    "energy": jnp.concatenate([cap[1], final_row["energy"]]),
                }
            else:
                scalars = final_row
        ret = [new_latents, pgrads]
        if capture_stride > 0:
            ret.append(traj)
        if return_scalars:
            ret.append(scalars)
        if emit_warm_opt_state:
            ret.append(warm_mv)
        return tuple(ret)

    if return_scalars or warm_pgrads or batch_tile is not None:
        raise ValueError(
            "return_scalars/warm_pgrads/batch_tile require packed=True"
        )
    kernel = _make_kernel(
        T=T, mixing=mixing, lr=lr, noise_std=noise_std,
        loss=loss, inv_var=1.0 / input_var, with_pgrads=with_pgrads,
        bf16_matmul=bf16_matmul,
    )

    out_shapes = [
        jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        jax.ShapeDtypeStruct(x1.shape, jnp.float32),
        jax.ShapeDtypeStruct(x2.shape, jnp.float32),
    ]
    if with_pgrads:
        out_shapes += [
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(b1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct(b2.shape, jnp.float32),
            jax.ShapeDtypeStruct(w3.shape, jnp.float32),
            jax.ShapeDtypeStruct(b3.shape, jnp.float32),
            jax.ShapeDtypeStruct(b0.shape, jnp.float32),
        ]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 13
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * (n_in - 1),
        out_specs=[vmem] * len(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, dtype=jnp.int32).reshape(1),
        w0, b0, w1, b1, w2, b2, w3, b3,
        x0, x1, x2,
        target if target is not None else jnp.zeros((B, w3.shape[1]), jnp.float32),
    )
    new_latents = tuple(outs[:3])
    if not with_pgrads:
        return new_latents, None
    gw1, gb1, gw2, gb2, gw3, gb3, gb0 = outs[3:]
    pgrads = (
        {"w": jnp.zeros_like(w0), "b": gb0},
        {"w": gw1, "b": gb1},
        {"w": gw2, "b": gb2},
        {"w": gw3, "b": gb3},
    )
    return new_latents, pgrads
