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
                             Gaussian: (logits - y)/var;  unclamped: 0;
                             masked variants zero s outside the clamped
                             trailing pixel window, utils/model.py:24-33)
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

Layout.  Latents live packed in one VMEM buffer X = [x0 | x1 | x2] whose
blocks are LANE-ALIGNED: each block is padded to a multiple of 128 lanes
(pad lanes pinned to exactly zero), so per-block slices never relayout.
For the canonical architectures the aligned width equals the physical
padded width of the compact layout (e.g. 20+128+128 -> 384 = pad(276)), so
alignment is free.  Two matmul strategies share this layout:

* ``blockdiag`` — one ``act(X) @ wf`` per direction against the padded
  block-diagonal weight matrix.  ~3x extra (zero-block) FLOPs for ~3x fewer
  MXU dispatches: optimal when the chain is latency-bound (small batch).
* ``perlayer`` — three aligned-slice matmuls per direction, touching only
  the real weight blocks: optimal when the chain is compute-bound (wide
  batch), where the zero blocks would waste most of the MXU.

The (optionally bfloat16) forward and transposed weights are staged ONCE
per dispatch — never converted or transposed inside the step loop.
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


def _pad128(d: int) -> int:
    return -(-d // 128) * 128


def aligned_layout(dims: tp.Sequence[int]):
    """Lane-aligned packed layout for latent dims: (padded widths, block
    offsets, total width).  Every block starts at a multiple of 128."""
    pads = tuple(_pad128(d) for d in dims)
    offs, o = [], 0
    for p in pads:
        offs.append(o)
        o += p
    return pads, tuple(offs), o


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


def _loss_mask(D: int, mask_k: int, shape2d):
    """Column mask for the masked sensory losses: True on the trailing
    ``mask_k`` real features (reference utils/model.py:24-33 clamp only the
    last round(D*perc) pixels).  ``mask_k == 0`` selects ALL real features:
    the reference slices ``output[:, -k:]``, and ``-0:`` is the whole array —
    so a perc small enough to round to zero clamps everything, not nothing.
    ``shape2d`` is (rows, pD); pad lanes (col >= D) are always False."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape2d, 1)
    lo = D - mask_k if mask_k > 0 else 0
    return jnp.logical_and(col >= lo, col < D)


# Target live-row count for the trajectory scalar recompute: the forward
# intermediates (logits/elem/err at the 784-wide output) are ~(3*D+d1+d2)/XW
# times the trajectory slice, so recomputing all captured steps at once
# would peak at several times the trajectory bytes the trainer's
# eligibility budget counts.  Chunking keeps the recompute's live set to
# ~chunk_rows * (3*D+d1+d2) * 4 bytes (~200 MB on the flagship dims).
_SCALAR_RECOMPUTE_ROWS = 16384


def _traj_scalar_rows(traj, params_flat, target, dims, activation, loss,
                      inv_var, mask_k=0, traj3=None, inv_var3=None):
    """Pre-update loss/energy sums for each captured step, recomputed from
    the aligned packed latent trajectory (the same forward the engine runs
    per step, pc_trainer.py:777-795).  ``traj`` is [n_cap, B, XW] aligned;
    ``params_flat`` = (b0, w1, b1, w2, b2, w3, b3) (real, unpadded).  With
    ``traj3`` (output-PC joint samplers) the trailing site's energy
    0.5*inv_var3*(x3-logits)^2 is added.  Returns ([n_cap] loss, [n_cap]
    energy).  Long trajectories are recomputed in fixed row chunks
    (lax.map) so the live set stays bounded regardless of n_cap."""
    n_cap, B = traj.shape[0], traj.shape[1]
    chunk = max(1, _SCALAR_RECOMPUTE_ROWS // B)
    if n_cap > chunk:
        block = functools.partial(
            _traj_scalar_block, params_flat=params_flat, target=target,
            dims=dims, activation=activation, loss=loss, inv_var=inv_var,
            mask_k=mask_k, inv_var3=inv_var3,
        )
        n_full = (n_cap // chunk) * chunk
        head = traj[:n_full].reshape((-1, chunk) + traj.shape[1:])
        if traj3 is not None:
            head3 = traj3[:n_full].reshape((-1, chunk) + traj3.shape[1:])
            l_h, e_h = jax.lax.map(lambda a: block(a[0], traj3=a[1]),
                                   (head, head3))
        else:
            l_h, e_h = jax.lax.map(lambda a: block(a, traj3=None), head)
        loss_rows, energy_rows = l_h.reshape(-1), e_h.reshape(-1)
        if n_full < n_cap:
            l_t, e_t = block(
                traj[n_full:],
                traj3=traj3[n_full:] if traj3 is not None else None,
            )
            loss_rows = jnp.concatenate([loss_rows, l_t])
            energy_rows = jnp.concatenate([energy_rows, e_t])
        return loss_rows, energy_rows
    return _traj_scalar_block(traj, params_flat, target, dims, activation,
                              loss, inv_var, mask_k, traj3, inv_var3)


def _traj_scalar_block(traj, params_flat, target, dims, activation, loss,
                       inv_var, mask_k=0, traj3=None, inv_var3=None):
    """One chunk of `_traj_scalar_rows` — all intermediates live at once."""
    b0, w1, b1, w2, b2, w3, b3 = params_flat
    d0, d1, d2, D = dims
    _, offs, _ = aligned_layout((d0, d1, d2))
    x0 = traj[:, :, offs[0] : offs[0] + d0]
    x1 = traj[:, :, offs[1] : offs[1] + d1]
    x2 = traj[:, :, offs[2] : offs[2] + d2]
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
    if traj3 is not None:
        err3 = traj3[:, :, :D] - logits
        energy = energy + 0.5 * inv_var3 * jnp.sum(err3 * err3, axis=(1, 2))
    if loss.startswith("bernoulli"):
        y = target[None, :, :]
        elem = (
            jnp.maximum(logits, 0.0)
            - logits * y
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
    elif loss.startswith("gaussian"):
        elem = 0.5 * inv_var * (logits - target[None, :, :]) ** 2
    else:
        return jnp.zeros(traj.shape[0], jnp.float32), energy
    if loss.endswith("_mask"):
        elem = jnp.where(_loss_mask(D, mask_k, elem.shape[1:]), elem, 0.0)
    return jnp.sum(elem, axis=(1, 2)), energy


def _fmix32(x):
    """murmur3 finalizer (full avalanche) on uint32 arrays."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _mock_bits(shape, seed, draw):
    """Deterministic uint32 grid for INTERPRET-mode noise.

    The TPU on-core PRNG (``pltpu.prng_seed``/``prng_random_bits``) has no
    CPU lowering, so ``interpret=True`` kernels substitute this stateless
    counter generator: draw number ``draw`` of the stream keyed ``seed`` is
    a pure function of (seed, draw, element index) — two murmur3-finalizer
    rounds over a Weyl-style combination.  It is NOT the hardware stream,
    but it is deterministic, well-mixed (passes the stationary Langevin
    noise-law check at the tolerances of tests/test_pallas_noise.py), and
    — crucially — draw-indexed: the noise is a pure function of
    (seed, draw, element index), which is what the deterministic CPU noise
    tests (tests/test_pallas_noise.py) need.
    """
    rows, cols = shape
    idx = (
        jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(cols)
        + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    )
    h = (
        jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + jnp.asarray(draw).astype(jnp.uint32) * jnp.uint32(0x6C62272E)
    )
    return _fmix32(_fmix32(h + idx) ^ jnp.uint32(0xA511E9B3))


def _uniforms(shape, mock=None):
    """(u1, u2) uniform pairs from on-core random bits via exponent-bitcast:
    (bits>>9)|0x3F800000 reinterpreted as float32 lies in [1, 2), so
    u1 = 2 - f ∈ (0, 1] (safe for log) and u2 = f - 1 ∈ [0, 1).

    Distributional note: u1 is quantized to 23 bits (min 2^-23), so the
    Box-Muller radius sqrt(-2*ln(u1)) caps at ~5.65 sigma — normal deviates
    beyond that are never sampled (P ≈ 1.6e-8 per draw; a handful of draws
    in a T=10000 B=256 flagship chain).  This is a deliberate deviation
    from torch.randn's deeper tail: the exponent-bitcast path is branch-free
    and lane-parallel, and the truncation is far below the noise-law gate's
    statistical resolution (benchmarks/kernel_sanity.py) and any effect
    observable in MCPC's Langevin chains (noise is multiplied by
    sqrt(lr*var) ~ 0.14).

    ``mock=(seed, draw)`` (interpret mode only): bits come from
    :func:`_mock_bits` draws ``draw`` and ``draw + 1`` instead of the
    on-core PRNG, through the same exponent-bitcast construction."""
    if mock is not None:
        seed, draw = mock
        f1 = jax.lax.bitcast_convert_type(
            (_mock_bits(shape, seed, draw) >> 9) | jnp.uint32(0x3F800000),
            jnp.float32,
        )
        f2 = jax.lax.bitcast_convert_type(
            (_mock_bits(shape, seed, draw + 1) >> 9) | jnp.uint32(0x3F800000),
            jnp.float32,
        )
        return 2.0 - f1, f2 - 1.0
    f1 = pltpu.bitcast(
        (pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 9)
        | jnp.uint32(0x3F800000),
        jnp.float32,
    )
    f2 = pltpu.bitcast(
        (pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 9)
        | jnp.uint32(0x3F800000),
        jnp.float32,
    )
    return 2.0 - f1, f2 - 1.0


def _sigmoid(x):
    """``sigmoid(x)`` via the exact identity ``0.5 + 0.5*tanh(x/2)``.

    Mosaic's ``tanh`` is nearly free while ``jax.nn.sigmoid`` lowers to an
    exp + divide costing ~0.26 us per [256, 384] f32 tile — the identity
    saves ~0.1 us/tile on the Bernoulli ``s`` term computed every step
    (benchmarks/vpu_op_bench.py).  Differences vs ``jax.nn.sigmoid`` are
    fp-rounding only (the identity is mathematically exact); the
    kernel<->engine parity suites and the hardware gate bound the chain
    amplification of that rounding."""
    return 0.5 + 0.5 * jnp.tanh(0.5 * x)


def _sincos_2pi(u):
    """``(cos(2*pi*u), sin(2*pi*u))`` for ``u`` in [0, 1) via quadrant
    reduction + odd/even Taylor polynomials on [0, pi/2).

    Mosaic lowers ``jnp.sin``/``jnp.cos`` through generic range reduction
    at ~2.4 us per [256, 384] f32 tile each — the two costliest VPU ops in
    the chain step by an order of magnitude (benchmarks/vpu_op_bench.py).
    The Box-Muller phase is ALREADY a uniform in turns, so the reduction is
    one floor: this pair costs ~1/3 of the hardware pair inside the full
    Box-Muller draw.  Max abs error ~5e-7 (fp-rounding dominated) — orders
    below the noise-law gate's statistical resolution (kernel_sanity)."""
    t = 4.0 * u
    q = jnp.floor(t)
    x = (np.pi / 2.0) * (t - q)          # [0, pi/2)
    x2 = x * x
    # sin truncation error < 5e-8 (x^13 term), cos < 7e-9 (x^14 term)
    s = x * (1.0 + x2 * (-1.66666667e-1 + x2 * (8.33333333e-3
             + x2 * (-1.98412698e-4 + x2 * (2.75573192e-6
             + x2 * (-2.50521084e-8))))))
    c = 1.0 + x2 * (-0.5 + x2 * (4.16666667e-2
             + x2 * (-1.38888889e-3 + x2 * (2.48015873e-5
             + x2 * (-2.75573192e-7 + x2 * 2.08767570e-9)))))
    qi = q.astype(jnp.int32) & 3
    swap = (qi & 1) == 1
    s1 = jnp.where(swap, c, s)
    c1 = jnp.where(swap, s, c)
    return (
        jnp.where((qi == 1) | (qi == 2), -c1, c1),
        jnp.where(qi >= 2, -s1, s1),
    )


def _normals(shape, mock=None):
    """Standard normals via Box-Muller, using both the cos and sin branches
    so each (log, sqrt) pair yields two normals.  (Used by the unpacked
    baseline kernel; the packed kernel amortizes the pair across two steps.)
    Consumes 2 draws; ``mock`` as in :func:`_uniforms`.
    """
    rows, cols = shape
    half = (cols + 1) // 2
    u1, u2 = _uniforms((rows, half), mock)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    c, s = _sincos_2pi(u2)
    z = jnp.concatenate([r * c, r * s], axis=1)
    return z[:, :cols]


def _scalar_slots(T: int, warm_T: int, scalar_stride: int):
    """(n_scal, n_rows) for the per-step scalar mode: one slot per emitted
    step (t % stride == 0 over the Langevin phase, or the warm phase for
    warm-only chains) plus the final-step slot; 64 (loss, energy) lane
    pairs pack per 128-lane row."""
    if scalar_stride <= 0:
        return 0, 0
    cap_T = T if T > 0 else warm_T
    n_scal = -(-cap_T // scalar_stride) + 1
    return n_scal, -(-n_scal // 64)


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
                        output_pc: bool = False,
                        inv_var3: float = 1.0,
                        mask_k: int = 0,
                        layout: str = "blockdiag",
                        scalar_stride: int = 0,
                        warm_init: bool = False,
                        interpret: bool = False):
    """Aligned-packed chain kernel; see the module docstring for layout and
    matmul-strategy notes.  ``interpret`` switches the noise source to the
    deterministic counter generator (:func:`_mock_bits`) since the on-core
    PRNG has no CPU lowering."""
    d0, d1, d2, D = dims
    (p0, p1, p2), (O0, O1, O2), XW = aligned_layout((d0, d1, d2))
    (q1, q2, pD), (Q1, Q2, Q3), OW = aligned_layout((d1, d2, D))
    perlayer = layout == "perlayer"
    # skip the output-layer backward matmul when nothing clamps the output
    has_s = output_pc or loss != "none"
    # per-step scalar mode (scalar_stride > 0): slot r's (loss, energy)
    # pair lives at row r//64, lanes (2*(r%64), 2*(r%64)+1) of the [n_rows,
    # 128] `scal` output — ~240 KB of VMEM for a 30k-step chain (469 rows
    # x 128 lanes x 4 B), versus the multi-GB HBM trajectory the recompute
    # path would need
    n_scal, _ = _scalar_slots(T, warm[0] if warm is not None else 0,
                              scalar_stride)

    def kernel(
        seed_ref,  # SMEM [1]
        wf, wfT,  # aligned block-diagonal weights [XW,OW] and transpose
        b0p, b_cat,  # aligned prior bias [p0] / concatenated biases [OW]
        x_in,  # aligned packed latents tile [tile_B, XW]
        y,  # padded target tile [tile_B, pD]; with output_pc this is x3_in
        *rest,  # inputs (warm_init only): [bias0 (SMEM [2]: b1^(c0+1),
                # b2^(c0+1)), m_in, v_in (, m3_in, v3_in)];
                # then x_out (packed latents out tile);
                # then outputs: [x3_out] when output_pc, then [m_out, v_out
                # (, m3_out, v3_out)] when emit_warm_opt_state, then
                # [gw_full, gb_cat, gb0] when with_pgrads, then [scal] when
                # emit_scalars, then [traj (HBM) (, traj3)] when
                # capture_stride > 0; scratch: capture dma semaphores
    ):
        k = 0
        bias0 = m_in = v_in = m3_in = v3_in = None
        if warm_init:
            # continuation inputs: live Adam moments + bias-correction powers
            # (reference semantics: the optimizer-x object persists across
            # train_on_batch calls, pc_trainer.py:741-752)
            bias0, m_in, v_in = rest[k : k + 3]
            k += 3
            if output_pc:
                m3_in, v3_in = rest[k : k + 2]
                k += 2
        x_out = rest[k]  # packed latents out tile
        k += 1
        if output_pc:
            x3_out = rest[k]  # trailing latent tile [tile_B, pD]
            k += 1
        if emit_warm_opt_state:
            m_out, v_out = rest[k : k + 2]  # final Adam moments [tile_B, XW]
            k += 2
            if output_pc:
                m3_out, v3_out = rest[k : k + 2]
                k += 2
        if with_pgrads:
            gw_full, gb_cat, gb0 = rest[k : k + 3]
            k += 3
        if emit_scalars:
            scal = rest[k]  # VMEM [1, 128]: final-step pre-update loss/energy
            k += 1
        traj_ref = traj3_ref = None
        if capture_stride > 0:
            traj_ref = rest[k]  # HBM [n_cap, B, XW]
            k += 1
            if output_pc:
                traj3_ref = rest[k]
                k += 1
        scratch = rest[k:]
        k = 0
        if capture_stride > 0:
            dma_sem = scratch[k]
            k += 1
            if output_pc:
                dma_sem3 = scratch[k]
                k += 1
        tile_i = pl.program_id(0)
        mock_seed = None
        if noise_std > 0.0:
            if interpret:
                # no CPU lowering for the on-core PRNG: interpret-mode noise
                # uses the stateless counter generator keyed by this seed
                # (same per-tile decorrelation as the hardware stream)
                mock_seed = seed_ref[0] + tile_i
            else:
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
            # b (weights) is staged in the matmul dtype already
            if bf16_matmul:
                a = a.astype(jnp.bfloat16)
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def mmT(a, b):
            # aᵀ @ b without materializing the transpose
            if bf16_matmul:
                a = a.astype(jnp.bfloat16)
                b = b.astype(jnp.bfloat16)
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def act(X):
            if activation == "relu":
                return jnp.maximum(X, 0.0)
            return jnp.tanh(X)

        def sensory_s(logits):
            """dLoss/dlogits on the padded [*, pD] logits block."""
            if output_pc:
                # trailing PC site: the sensory layer is an unclamped latent
                # with energy 0.5*inv_var3*(x3 - logits)^2 — its dE/dlogits
                # has exactly the Gaussian-loss form with y := x3
                err3 = x3_out[...] - logits
                return -err3 * inv_var3, err3
            if loss == "bernoulli":
                s = _sigmoid(logits) - y[...]
            elif loss == "gaussian":
                s = (logits - y[...]) * inv_var
            elif loss == "bernoulli_mask":
                s = jnp.where(
                    _loss_mask(D, mask_k, logits.shape),
                    _sigmoid(logits) - y[...],
                    0.0,
                )
            elif loss == "gaussian_mask":
                s = jnp.where(
                    _loss_mask(D, mask_k, logits.shape),
                    (logits - y[...]) * inv_var,
                    0.0,
                )
            else:
                s = jnp.zeros_like(logits)
            return s, None

        def eval_grads(X):
            """One fused forward+backward over the current latents.

            Returns (G [B,XW], blocks dict) where blocks holds H, err0/E1/E2,
            S (=dLoss/dlogits, padded), logits, err3 — everything the pgrad /
            scalar emitters reuse."""
            H = act(X)
            if activation == "relu":
                dH = jnp.where(X > 0, 1.0, 0.0)
            else:  # tanh' = 1 - tanh^2
                dH = 1.0 - H * H
            if perlayer:
                mu1 = mm(H[:, O0 : O0 + p0], wf[O0 : O0 + p0, Q1 : Q1 + q1]) \
                    + b_cat[Q1 : Q1 + q1][None, :]
                mu2 = mm(H[:, O1 : O1 + p1], wf[O1 : O1 + p1, Q2 : Q2 + q2]) \
                    + b_cat[Q2 : Q2 + q2][None, :]
                logits = mm(H[:, O2 : O2 + p2], wf[O2 : O2 + p2, Q3 : Q3 + pD]) \
                    + b_cat[Q3 : Q3 + pD][None, :]
            else:
                MU = mm(H, wf[...]) + b_cat[...][None, :]  # [B, OW]
                mu1 = MU[:, Q1 : Q1 + q1]
                mu2 = MU[:, Q2 : Q2 + q2]
                logits = MU[:, Q3 : Q3 + pD]
            err0 = X[:, O0 : O0 + p0] - b0p[...][None, :]
            E1 = X[:, O1 : O1 + p1] - mu1
            E2 = X[:, O2 : O2 + p2] - mu2
            S, err3 = sensory_s(logits)

            if perlayer:
                back0 = mm(E1, wfT[Q1 : Q1 + q1, O0 : O0 + p0])
                back1 = mm(E2, wfT[Q2 : Q2 + q2, O1 : O1 + p1])
                if has_s:
                    back2 = mm(-S, wfT[Q3 : Q3 + pD, O2 : O2 + p2])
                else:
                    back2 = jnp.zeros((X.shape[0], p2), jnp.float32)
                back = jnp.concatenate([back0, back1, back2], axis=1)
            else:
                # V @ wfT = [E1@W1ᵀ | E2@W2ᵀ | -S@W3ᵀ]
                V = jnp.concatenate([E1, E2, -S], axis=1)
                back = mm(V, wfT[...])  # [B, XW]
            err_cat = jnp.concatenate([err0, E1, E2], axis=1)
            G = err_cat - dH * back
            blocks = dict(H=H, err0=err0, E1=E1, E2=E2, S=S, logits=logits,
                          err3=err3)
            return G, blocks

        def scal_sums(bl):
            """(loss, energy) batch-tile sums from the PRE-update state (the
            engine/reference scalar convention, pc_trainer.py:777-795) —
            accumulated across batch tiles by the callers below."""
            energy_s = 0.5 * (
                jnp.sum(bl["err0"] * bl["err0"])
                + jnp.sum(bl["E1"] * bl["E1"])
                + jnp.sum(bl["E2"] * bl["E2"])
            )
            if output_pc:
                energy_s += 0.5 * inv_var3 * jnp.sum(bl["err3"] * bl["err3"])
            # real-feature slices: the pD pad lanes would otherwise pollute
            # the Bernoulli sum (bce(0,0) = log 2 per pad lane)
            lg = bl["logits"][:, :D]
            yv = y[:, :D]
            if loss.startswith("bernoulli"):
                elem = (
                    jnp.maximum(lg, 0.0)
                    - lg * yv
                    + jnp.log1p(jnp.exp(-jnp.abs(lg)))
                )
            elif loss.startswith("gaussian"):
                elem = 0.5 * inv_var * (lg - yv) ** 2
            else:
                elem = None
            if elem is None:
                loss_s = jnp.zeros(())
            else:
                if loss.endswith("_mask"):
                    elem = jnp.where(_loss_mask(D, mask_k, elem.shape), elem, 0.0)
                loss_s = jnp.sum(elem)
            return loss_s, energy_s

        def scal_row(bl):
            """[1, 128] row: lane 0 = sensory loss, lane 1 = layer energy.
            Only the FINAL step's row is emitted in this mode; per-captured-
            step scalars are recomputed from the HBM trajectory outside the
            kernel (mcpc_chain_pallas), which keeps the hot loop free of the
            O(n_cap) masked accumulator."""
            loss_s, energy_s = scal_sums(bl)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            return jnp.where(
                lane == 0, loss_s, jnp.where(lane == 1, energy_s, 0.0)
            )

        def emit_scal_slot(slot, bl):
            """Per-step scalar mode (scalar_stride > 0): accumulate slot's
            (loss, energy) pair into its lane pair of row slot//64 — a
            dynamic-sublane read-modify-write of one [1, 128] row, so the
            hot loop carries no O(n_scal) accumulator."""
            loss_s, energy_s = scal_sums(bl)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            r2 = 2 * (slot % 64)
            row = jnp.where(
                lane == r2, loss_s, jnp.where(lane == r2 + 1, energy_s, 0.0)
            )
            idx = slot // 64
            scal[pl.ds(idx, 1), :] = scal[pl.ds(idx, 1), :] + row

        def accum_pgrads(bl):
            """Hebbian parameter grads: gW_l = -H_{l-1}ᵀ err_l (output layer:
            +H2ᵀ S).  blockdiag computes the full HᵀV product (off-diagonal
            blocks are discarded at slice-out); perlayer touches only the
            real blocks."""
            H = bl["H"]
            if perlayer:
                gw_full[O0 : O0 + p0, Q1 : Q1 + q1] += mmT(
                    H[:, O0 : O0 + p0], -bl["E1"]
                )
                gw_full[O1 : O1 + p1, Q2 : Q2 + q2] += mmT(
                    H[:, O1 : O1 + p1], -bl["E2"]
                )
                gw_full[O2 : O2 + p2, Q3 : Q3 + pD] += mmT(
                    H[:, O2 : O2 + p2], bl["S"]
                )
                gb_cat[Q1 : Q1 + q1] += jnp.sum(-bl["E1"], axis=0)
                gb_cat[Q2 : Q2 + q2] += jnp.sum(-bl["E2"], axis=0)
                gb_cat[Q3 : Q3 + pD] += jnp.sum(bl["S"], axis=0)
            else:
                V = jnp.concatenate([bl["E1"], bl["E2"], -bl["S"]], axis=1)
                gw_full[...] += mmT(H, -V)
                gb_cat[...] += jnp.sum(-V, axis=0)
            gb0[...] += jnp.sum(-bl["err0"], axis=0)

        # validity mask: True on real-latent lanes, False on block padding —
        # keeps pad lanes pinned to zero under noise
        def valid_mask(shape2d):
            col = jax.lax.broadcasted_iota(jnp.int32, shape2d, 1)
            return (
                (col < d0)
                | ((col >= O1) & (col < O1 + d1))
                | ((col >= O2) & (col < O2 + d2))
            )

        def box_muller(shape, mask, mock=None):
            """Both Box-Muller branches as VALUES (one log/sqrt/sincos per
            pair of steps — consumed by two consecutive inlined steps, no
            scratch round-trip, no per-step predication).  The phase uses
            the polynomial sincos (_sincos_2pi): Mosaic's sin/cos are the
            two costliest ops in the whole step."""
            u1, u2 = _uniforms(shape, mock)
            q = -2.0 * jnp.log(u1)
            # Radius via plain sqrt: the round-5 hardware A/B
            # (hw_transcripts/r5/r5_prefetch_fixed.log) timed two
            # alternative schedulings — a software-pipelined prefetch and a
            # q*rsqrt(q) radius — and the plain loop won at every batch
            # (variants x0.69-0.98); both were deleted.  ROOFLINE.md shows
            # the noise path already runs at the VPU's issue rate.  If a
            # guarded-rsqrt form ever returns: the guard must be a max()
            # against a NORMAL f32 — the VPU flushes denormals, so an
            # additive 1e-38 pad silently vanishes on hardware and u1=1
            # draws (q=0) produce 0*rsqrt(0) = NaN.
            r = jnp.sqrt(q)
            c, s = _sincos_2pi(u2)
            return (
                jnp.where(mask, r * c, 0.0),
                jnp.where(mask, r * s, 0.0),
            )

        def body(m_ref, v_ref, m3_ref, v3_ref):
            # -- optional Adam MAP warm start (the reference's PC phase:
            # utils/model.py:121-131 runs T_pc Adam steps on the latents
            # before the Langevin chain) -----------------------------------
            if warm is not None:
                warm_T, warm_lr, wb1, wb2, weps = warm
                if warm_init:
                    m_ref[...] = m_in[...]
                    v_ref[...] = v_in[...]
                    if output_pc:
                        m3_ref[...] = m3_in[...]
                        v3_ref[...] = v3_in[...]
                else:
                    m_ref[...] = jnp.zeros_like(m_ref)
                    v_ref[...] = jnp.zeros_like(v_ref)
                    if output_pc:
                        m3_ref[...] = jnp.zeros_like(m3_ref)
                        v3_ref[...] = jnp.zeros_like(v3_ref)

                def adam_update(m_r, v_r, G):
                    m = wb1 * m_r[...] + (1.0 - wb1) * G
                    v = wb2 * v_r[...] + (1.0 - wb2) * G * G
                    m_r[...] = m
                    v_r[...] = v
                    return m, v

                def warm_step(t, carry):
                    # bias-correction powers carried incrementally — Mosaic
                    # has no powf with a traced exponent.  The update uses
                    # the EXACT optax/torch operation order (mhat = m/(1-b1^t)
                    # etc.): an algebraically-folded one-divide variant
                    # drifts a few small-denominator elements past the 5e-4
                    # hardware-parity budget over ~40 steps, and the warm
                    # phase is matmul-bound, not divide-bound.
                    b1p, b2p = carry
                    X = x_out[...]
                    if capture_stride > 0 and T == 0:
                        # warm-only chains (the reference PC trainer with
                        # captures, e.g. figure_2.py:167-171 MAP phase):
                        # record the pre-update latents every stride steps
                        @pl.when(t % capture_stride == 0)
                        def _():
                            slot = t // capture_stride
                            cp = pltpu.make_async_copy(
                                x_out,
                                traj_ref.at[
                                    slot, pl.ds(tile_i * tile_B, tile_B)
                                ],
                                dma_sem,
                            )
                            cp.start()
                            if output_pc:
                                cp3 = pltpu.make_async_copy(
                                    x3_out,
                                    traj3_ref.at[
                                        slot, pl.ds(tile_i * tile_B, tile_B)
                                    ],
                                    dma_sem3,
                                )
                                cp3.start()
                                cp3.wait()
                            cp.wait()
                    G, bl = eval_grads(X)
                    if warm_pgrads:
                        # PC training: update_p='last' takes the final
                        # step's pre-update gradients (pc_trainer.py:904-914)
                        @pl.when(t == warm_T - 1)
                        def _():
                            accum_pgrads(bl)
                    if emit_scalars and T == 0:
                        if scalar_stride > 0:
                            # pure-PC chain, per-step scalars: slot per
                            # emitted warm step + the final-step slot
                            @pl.when(t % scalar_stride == 0)
                            def _():
                                emit_scal_slot(t // scalar_stride, bl)

                            @pl.when(t == warm_T - 1)
                            def _():
                                emit_scal_slot(jnp.int32(n_scal - 1), bl)
                        else:
                            # the last pre-update scalars come from the warm
                            # phase's final step
                            @pl.when(t == warm_T - 1)
                            def _():
                                scal[...] += scal_row(bl)
                    c1 = 1.0 - b1p
                    c2 = 1.0 - b2p
                    m, v = adam_update(m_ref, v_ref, G)
                    x_out[...] = X - warm_lr * (m / c1) / (
                        jnp.sqrt(v / c2) + weps
                    )
                    if output_pc:
                        g3 = inv_var3 * bl["err3"]
                        m3, v3 = adam_update(m3_ref, v3_ref, g3)
                        x3_out[...] = x3_out[...] - warm_lr * (m3 / c1) / (
                            jnp.sqrt(v3 / c2) + weps
                        )
                    return (b1p * wb1, b2p * wb2)

                # bias-correction powers start at b^(count0+1): for fresh
                # optimizers count0 = 0; continuation dispatches pass the
                # live powers via SMEM (count stays traced, no host sync)
                if warm_init:
                    carry0 = (bias0[0], bias0[1])
                else:
                    carry0 = (jnp.float32(wb1), jnp.float32(wb2))
                jax.lax.fori_loop(0, warm_T, warm_step, carry0)
                if emit_warm_opt_state:
                    # final Adam moments, so the trainer can hand the
                    # optimizer-x state to the engine for continuation calls
                    # (reference semantics: the optimizer object persists
                    # across train_on_batch calls, pc_trainer.py:741-752)
                    m_out[...] = m_ref[...]
                    v_out[...] = v_ref[...]
                    if output_pc:
                        m3_out[...] = m3_ref[...]
                        v3_out[...] = v3_ref[...]

            # -- Langevin phase ---------------------------------------------
            def step(t, z, z3):
                X = x_out[...]

                if capture_stride > 0:
                    # record the pre-update latents every stride steps
                    # (matches the engine's capture timing): DMA straight
                    # from the aligned VMEM block to the HBM trajectory —
                    # block starts are 128-lane-aligned by construction
                    @pl.when(t % capture_stride == 0)
                    def _():
                        slot = t // capture_stride
                        cp = pltpu.make_async_copy(
                            x_out,
                            traj_ref.at[slot, pl.ds(tile_i * tile_B, tile_B)],
                            dma_sem,
                        )
                        cp.start()
                        if output_pc:
                            cp3 = pltpu.make_async_copy(
                                x3_out,
                                traj3_ref.at[
                                    slot, pl.ds(tile_i * tile_B, tile_B)
                                ],
                                dma_sem3,
                            )
                            cp3.start()
                            cp3.wait()
                        cp.wait()

                G, bl = eval_grads(X)

                if emit_scalars:
                    if scalar_stride > 0:
                        @pl.when(t % scalar_stride == 0)
                        def _():
                            emit_scal_slot(t // scalar_stride, bl)

                        @pl.when(t == T - 1)
                        def _():
                            emit_scal_slot(jnp.int32(n_scal - 1), bl)
                    else:
                        @pl.when(t == T - 1)
                        def _():
                            scal[...] += scal_row(bl)

                if with_pgrads:
                    @pl.when(t >= mixing)
                    def _():
                        accum_pgrads(bl)

                if noise_std > 0.0:
                    x_out[...] = X - lr * G + noise_std * z
                else:
                    x_out[...] = X - lr * G
                if output_pc:
                    # trailing latent's Langevin step: dE/dx3 = inv_var3*err3
                    g3 = inv_var3 * bl["err3"]
                    if noise_std > 0.0:
                        x3_out[...] = x3_out[...] - lr * g3 + noise_std * z3
                    else:
                        x3_out[...] = x3_out[...] - lr * g3

            if noise_std > 0.0:
                # two steps per iteration: each Box-Muller draw yields two
                # independent normals, consumed back-to-back (T is static,
                # so the odd-T epilogue costs no in-loop predication)
                draws_per_pair = 4 if output_pc else 2

                def gen_pair(p):
                    # p = pair index; consulted only in interpret mode (the
                    # hardware PRNG is sequential) — it keys the mock draws
                    # so the draw sequence is a pure function of the pair
                    # index (deterministic CPU noise tests)
                    base = None
                    if interpret:
                        base = jnp.asarray(p, jnp.int32) * draws_per_pair
                    mock = (mock_seed, base) if interpret else None
                    za, zb = box_muller(x_in.shape, valid_mask(x_in.shape),
                                        mock)
                    if output_pc:
                        col3 = jax.lax.broadcasted_iota(
                            jnp.int32, x3_out.shape, 1
                        )
                        mock3 = (mock_seed, base + 2) if interpret else None
                        z3a, z3b = box_muller(x3_out.shape, col3 < D, mock3)
                    else:
                        z3a = z3b = None
                    return za, zb, z3a, z3b

                # Plain inline loop: generate a pair, consume it across two
                # consecutive steps.  A software-pipelined prefetch variant
                # (next pair issued before the current pair's steps) was
                # A/B'd on hardware and LOST at every batch (x0.69-0.97,
                # hw_transcripts/r5/r5_prefetch_fixed.log): the extra live
                # pair raises register pressure, and ROOFLINE.md shows the
                # noise path already runs at the VPU issue rate — there is
                # no bubble for the prefetch to fill.
                def pair(i, _):
                    za, zb, z3a, z3b = gen_pair(i)
                    t = 2 * i
                    step(t, za, z3a)
                    step(t + 1, zb, z3b)
                    return ()

                jax.lax.fori_loop(0, T // 2, pair, ())
                if T % 2:
                    za, _zb, z3a, _z3b = gen_pair(T // 2)
                    step(jnp.int32(T - 1), za, z3a)
            else:
                jax.lax.fori_loop(
                    0, T, lambda t, _: (step(t, None, None), ())[1], ()
                )

        if warm is not None:
            scopes = dict(
                m_ref=pltpu.VMEM(x_in.shape, jnp.float32),
                v_ref=pltpu.VMEM(x_in.shape, jnp.float32),
            )
            if output_pc:
                scopes["m3_ref"] = pltpu.VMEM((tile_B, pD), jnp.float32)
                scopes["v3_ref"] = pltpu.VMEM((tile_B, pD), jnp.float32)
                pl.run_scoped(body, **scopes)
            else:
                pl.run_scoped(
                    lambda m_ref, v_ref: body(m_ref, v_ref, None, None),
                    **scopes,
                )
        else:
            body(None, None, None, None)

    return kernel


def _make_kernel(T: int, mixing: int, lr: float, noise_std: float,
                 loss: str, inv_var: float, with_pgrads: bool,
                 bf16_matmul: bool = True, interpret: bool = False):
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
        mock_seed = None
        if noise_std > 0.0:
            if interpret:
                # on-core PRNG has no CPU lowering — counter-mock instead
                mock_seed = seed_ref[0]
            else:
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
                s = _sigmoid(logits) - y[...]
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
                # step t consumes draws [6t, 6t+6): 2 per _normals call
                mk = (
                    (lambda d: (mock_seed, t * 6 + d)) if interpret
                    else (lambda d: None)
                )
                n0 = _normals(x0v.shape, mk(0))
                n1 = _normals(x1v.shape, mk(2))
                n2 = _normals(x2v.shape, mk(4))
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


def _place_blocks(blocks, dims, total):
    """Concatenate [B, d_i] blocks into an aligned [B, total] buffer (zeros
    in block padding)."""
    parts = []
    for b, d in zip(blocks, dims):
        p = _pad128(d)
        parts.append(b)
        if p > d:
            parts.append(jnp.zeros((b.shape[0], p - d), jnp.float32))
    return jnp.concatenate(parts, axis=1)


def _pad_cols(a, width):
    if a.shape[1] == width:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((a.shape[0], width - a.shape[1]), a.dtype)], axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "T", "mixing", "lr", "noise_var", "loss", "input_var",
        "with_pgrads", "interpret", "bf16_matmul", "packed",
        "warm_T", "warm_lr", "warm_b1", "warm_b2", "warm_eps",
        "capture_stride", "activation", "warm_pgrads", "return_scalars",
        "batch_tile", "emit_warm_opt_state", "output_var", "mask_perc",
        "matmul_layout", "scalar_stride",
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
    loss: str = "bernoulli",  # 'bernoulli' | 'gaussian' (+'_mask') | 'none'
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
    mask_perc: tp.Optional[float] = None,
    matmul_layout: str = "auto",
    scalar_stride: int = 0,
    warm_mu: tp.Optional[tuple] = None,
    warm_nu: tp.Optional[tuple] = None,
    warm_count: tp.Optional[jax.Array] = None,
):
    """Run (optionally) warm_T Adam MAP steps then T fused MCPC steps.

    Returns ``(latents', pgrads_or_None)``, appending — in order — ``traj``
    when ``capture_stride > 0`` (ALIGNED packed pre-update latents every
    stride steps — over the Langevin phase, or over the warm phase for
    warm-only chains (T == 0, the reference PC-trainer-with-captures
    pattern); shape [ceil((T if T > 0 else warm_T)/stride), B, XW] with block offsets
    from :func:`aligned_layout`; with ``output_var`` a second ``traj3``
    [n_cap, B, pad128(D)] follows), ``scalars`` when ``return_scalars``
    (``{"loss": [R], "energy": [R]}`` batch sums with R = n_captures + 1;
    rows 0..R-2 are the captured steps' PRE-update values, row R-1 is the
    final step's pre-update value — the engine/reference convention,
    pc_trainer.py:777-795; the capture rows are recomputed in f32 from the
    trajectory outside the kernel).  With ``scalar_stride > 0`` (mutually
    exclusive with ``capture_stride``; requires ``return_scalars``) the
    kernel emits the per-step scalar rows ITSELF — slot r = step
    t // scalar_stride plus a final-step slot, lane-packed 64 pairs per
    VMEM row — so per-step loss/energy curves need no HBM trajectory at
    any T.  Also returns the packed final Adam moments when
    ``emit_warm_opt_state`` (``(m, v)``, or ``(m, v, m3, v3)`` with
    ``output_var`` — for handing optimizer-x state back to the engine on
    continuation calls).

    ``loss`` accepts the masked variants ``bernoulli_mask``/``gaussian_mask``
    with ``mask_perc``: only the trailing ``round(D*mask_perc)`` features are
    clamped (reference utils/model.py:24-33, the figure-2 image-completion
    posteriors and get_mse_rec MAP inference).

    ``matmul_layout``: 'blockdiag' (one fused block-diagonal matmul per
    direction — latency-optimal), 'perlayer' (per-layer aligned matmuls —
    FLOP-optimal at wide batch), or 'auto' (perlayer once the batch tile is
    compute-bound, >= 512 rows).

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
        if not packed:
            raise ValueError("output_var requires packed=True")
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
    warm_init = warm_mu is not None
    if warm_init:
        # warm continuation: resume the Adam moments from a live optimizer-x
        # state (VERDICT r3 weak #5 — PC train_on_batch without resample)
        if not warm_T:
            raise ValueError("warm_mu/warm_nu require warm_T > 0")
        if warm_nu is None or warm_count is None:
            raise ValueError("warm_mu requires warm_nu and warm_count")
        n_sites = 4 if output_var is not None else 3
        if len(warm_mu) != n_sites or len(warm_nu) != n_sites:
            raise ValueError(
                f"warm moments must cover all {n_sites} latent sites"
            )
    if activation != "relu" and not packed:
        raise ValueError("packed=False supports relu only")
    if capture_stride > 0 and T == 0 and warm_T == 0:
        raise ValueError("capture_stride requires steps (T > 0 or warm_T > 0)")
    if scalar_stride > 0:
        if not packed or not return_scalars:
            raise ValueError(
                "scalar_stride requires packed=True and return_scalars"
            )
        if capture_stride > 0:
            raise ValueError(
                "scalar_stride and capture_stride are mutually exclusive: "
                "capture runs get per-step scalars recomputed from the "
                "trajectory"
            )
        if T == 0 and warm_T == 0:
            raise ValueError("scalar_stride requires steps (T or warm_T)")
    if loss.endswith("_mask"):
        if mask_perc is None:
            raise ValueError("masked losses require mask_perc")
        if not packed:
            raise ValueError("masked losses require packed=True")
    mask_k = round(w3.shape[1] * mask_perc) if loss.endswith("_mask") else 0

    if packed:
        d0, d1, d2 = x0.shape[1], x1.shape[1], x2.shape[1]
        D = w3.shape[1]
        dims = (d0, d1, d2, D)
        (p0, p1, p2), (O0, O1, O2), XW = aligned_layout((d0, d1, d2))
        (q1, q2, pD), (Q1, Q2, Q3), OW = aligned_layout((d1, d2, D))
        wf = jnp.zeros((XW, OW), jnp.float32)
        wf = wf.at[O0 : O0 + d0, Q1 : Q1 + d1].set(w1)
        wf = wf.at[O1 : O1 + d1, Q2 : Q2 + d2].set(w2)
        wf = wf.at[O2 : O2 + d2, Q3 : Q3 + D].set(w3)
        b_cat = _place_blocks(
            [b1[None, :], b2[None, :], b3[None, :]], (d1, d2, D), OW
        )[0]
        b0p = _pad_cols(b0[None, :], p0)[0]
        X = _place_blocks([x0, x1, x2], (d0, d1, d2), XW)

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
        # captures span the Langevin phase, or the warm phase when the chain
        # is warm-only (T == 0)
        cap_T = T if T > 0 else warm_T
        n_cap = -(-cap_T // capture_stride) if capture_stride > 0 else 0
        if matmul_layout == "auto":
            matmul_layout = "perlayer" if tile >= 512 else "blockdiag"
        if matmul_layout not in ("blockdiag", "perlayer"):
            raise ValueError(f"unknown matmul_layout {matmul_layout!r}")

        # stage the weights in their matmul dtype ONCE (the kernel never
        # converts or transposes them per step)
        wfT = wf.T
        if bf16_matmul:
            wf = wf.astype(jnp.bfloat16)
            wfT = wfT.astype(jnp.bfloat16)

        kernel = _make_packed_kernel(
            T=T, mixing=mixing, lr=lr, noise_std=noise_std,
            loss=loss,
            inv_var=1.0 / input_var,
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
            inv_var3=(1.0 / output_var) if output_pc else 1.0,
            mask_k=mask_k,
            layout=matmul_layout,
            scalar_stride=scalar_stride,
            warm_init=warm_init,
            interpret=interpret,
        )
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        row_block = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0))
        out_shapes = [jax.ShapeDtypeStruct((B, XW), jnp.float32)]
        out_specs = [row_block(XW)]
        if output_pc:
            out_shapes.append(jax.ShapeDtypeStruct((B, pD), jnp.float32))
            out_specs.append(row_block(pD))
        if emit_warm_opt_state:
            out_shapes += [jax.ShapeDtypeStruct((B, XW), jnp.float32)] * 2
            out_specs += [row_block(XW)] * 2
            if output_pc:
                out_shapes += [jax.ShapeDtypeStruct((B, pD), jnp.float32)] * 2
                out_specs += [row_block(pD)] * 2
        if with_pgrads:
            out_shapes += [
                jax.ShapeDtypeStruct((XW, OW), jnp.float32),
                jax.ShapeDtypeStruct((OW,), jnp.float32),
                jax.ShapeDtypeStruct((p0,), jnp.float32),
            ]
            out_specs += [vmem] * 3
        n_scal, n_scal_rows = _scalar_slots(T, warm_T, scalar_stride)
        if return_scalars:
            out_shapes.append(jax.ShapeDtypeStruct(
                (n_scal_rows, 128) if scalar_stride > 0 else (1, 128),
                jnp.float32,
            ))
            out_specs.append(vmem)
        scratch = []
        if capture_stride > 0:
            out_shapes.append(
                jax.ShapeDtypeStruct((n_cap, B, XW), jnp.float32)
            )
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            if output_pc:
                out_shapes.append(
                    jax.ShapeDtypeStruct((n_cap, B, pD), jnp.float32)
                )
                out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        if capture_stride > 0:
            scratch.append(pltpu.SemaphoreType.DMA(()))
            if output_pc:
                scratch.append(pltpu.SemaphoreType.DMA(()))
        if output_pc:
            y_operand = _pad_cols(x3, pD)
        elif target is not None:
            y_operand = _pad_cols(target, pD)
        else:
            y_operand = jnp.zeros((B, pD), jnp.float32)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [vmem] * 4
            + [row_block(XW), row_block(pD)]
        )
        operands = [
            jnp.asarray(seed, dtype=jnp.int32).reshape(1),
            wf, wfT, b0p, b_cat,
            X,
            y_operand,
        ]
        if warm_init:
            cnt = (jnp.asarray(warm_count, jnp.int32) + 1).astype(jnp.float32)
            bias0 = jnp.stack(
                [
                    jnp.power(jnp.float32(warm_b1), cnt),
                    jnp.power(jnp.float32(warm_b2), cnt),
                ]
            )
            in_specs += [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                row_block(XW),
                row_block(XW),
            ]
            operands += [
                bias0,
                _place_blocks(list(warm_mu[:3]), (d0, d1, d2), XW),
                _place_blocks(list(warm_nu[:3]), (d0, d1, d2), XW),
            ]
            if output_pc:
                in_specs += [row_block(pD), row_block(pD)]
                operands += [
                    _pad_cols(warm_mu[3], pD),
                    _pad_cols(warm_nu[3], pD),
                ]
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(*operands)
        Xo = outs[0]
        new_latents = (
            Xo[:, O0 : O0 + d0],
            Xo[:, O1 : O1 + d1],
            Xo[:, O2 : O2 + d2],
        )
        pgrads = None
        k = 1
        if output_pc:
            new_latents = new_latents + (outs[k][:, :D],)
            k += 1
        warm_mv = None
        if emit_warm_opt_state:
            if output_pc:
                warm_mv = tuple(outs[k : k + 4])
                k += 4
            else:
                warm_mv = (outs[k], outs[k + 1])
                k += 2
        if with_pgrads:
            gw_full, gb_cat, gb0 = outs[k : k + 3]
            k += 3
            pgrads = (
                {"w": jnp.zeros_like(w0), "b": gb0[:d0]},
                {"w": gw_full[O0 : O0 + d0, Q1 : Q1 + d1],
                 "b": gb_cat[Q1 : Q1 + d1]},
                {"w": gw_full[O1 : O1 + d1, Q2 : Q2 + d2],
                 "b": gb_cat[Q2 : Q2 + d2]},
                {"w": gw_full[O2 : O2 + d2, Q3 : Q3 + D],
                 "b": gb_cat[Q3 : Q3 + D]},
            )
        final_row = scalar_rows = None
        if return_scalars:
            scal = outs[k]
            k += 1
            if scalar_stride > 0:
                # unpack the lane-packed slots: slot r lives at row r//64,
                # lanes (2*(r%64), 2*(r%64)+1)
                flat = scal.reshape(-1)
                r = jnp.arange(n_scal)
                pos = (r // 64) * 128 + 2 * (r % 64)
                scalar_rows = {"loss": flat[pos], "energy": flat[pos + 1]}
            else:
                final_row = {"loss": scal[:, 0], "energy": scal[:, 1]}
        traj = traj3 = None
        if capture_stride > 0:
            traj = outs[k]
            k += 1
            if output_pc:
                traj3 = outs[k]
                k += 1
        scalars = None
        if return_scalars:
            if scalar_rows is not None:
                scalars = scalar_rows
            elif traj is not None:
                # per-captured-step pre-update scalars, recomputed in f32
                # from the trajectory — same math as the engine's per-step
                # loss/energy (one batched forward over all captures; keeps
                # the chain kernel free of per-step scalar accumulators)
                cap = _traj_scalar_rows(
                    traj, (b0, w1, b1, w2, b2, w3, b3), target, dims,
                    activation, loss, 1.0 / input_var, mask_k=mask_k,
                    traj3=traj3,
                    inv_var3=(1.0 / output_var) if output_pc else None,
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
            if output_pc:
                ret.append(traj3)
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
        bf16_matmul=bf16_matmul, interpret=interpret,
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
