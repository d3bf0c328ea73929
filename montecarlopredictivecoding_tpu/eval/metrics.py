"""Evaluation metrics.

JAX re-expressions of the reference evaluation procedures
(``/root/reference/utils/training_evaluation.py:143-315``):

* masked-reconstruction MSE: clamp the bottom half of each image, MAP-infer
  latents, decode the deepest latent through the remaining layers, threshold,
  MSE on the hidden half;
* marginal likelihood: Monte-Carlo log-mean-exp estimate of log p(data) from
  ancestral logit samples (Bernoulli sensory model);
* sample-based KL (Pérez-Cruz 2008 nearest-neighbour estimator) — brute-force
  pairwise distances on device (TPU-friendly; no KD-tree host round-trip),
  with identical estimator math to the reference's scipy cKDTree version;
* discrete KL and the paired statistical test (Shapiro -> paired t / Wilcoxon).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..core.losses import bernoulli_fn, fe_fn
from ..core.model import PCModel
from ..core.modules import PC
from ..core.trainer import GenerativeModel
from .sampling import sample_pc


# -- masked reconstruction -----------------------------------------------------


def decode_from_deepest_latent(gen: GenerativeModel) -> jax.Array:
    """Decode the deepest PC latent through the trailing non-PC modules —
    the reference's ``gen_pc[-3:]`` walk (training_evaluation.py:163-165)."""
    last_pc = gen.model.pc_indices[-1]
    h = gen.latents[-1]
    li = sum(
        1
        for i in gen.model.linear_indices
        if i < last_pc
    )
    for m in gen.model.modules[last_pc + 1 :]:
        if isinstance(m, PC):
            raise ValueError("decode_from_deepest_latent assumes a trailing stack")
        if hasattr(m, "in_dim"):  # Linear
            h = m.apply(gen.params[li], h)
            li += 1
        else:
            h = m.apply(h)
    return h


def get_mse_rec(
    gen: GenerativeModel,
    config: dict,
    batches,
    trainer_factory=None,
) -> float:
    """Masked-reconstruction MSE (reference get_mse_rec,
    training_evaluation.py:143-174): MAP inference with only the last half of
    pixels clamped, then MSE over the hidden half."""
    from ..core.losses import bernoulli_fn_mask, fe_fn_mask
    from ..models.factory import get_pc_trainer

    loss_fn = config["loss_fn"]
    masked_loss = bernoulli_fn_mask if loss_fn is bernoulli_fn else fe_fn_mask
    trainer = (
        trainer_factory(gen, config)
        if trainer_factory is not None
        else get_pc_trainer(gen, config, is_mcpc=True, training=False)
    )

    mse, n_data = 0.0, 0
    for data, _ in batches:
        pseudo = jnp.zeros((data.shape[0], config["input_size"]))
        trainer.train_on_batch(
            pseudo,
            loss_fn=masked_loss,
            loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
            is_return_results_every_t=False,
        )
        img = decode_from_deepest_latent(gen)
        if loss_fn is bernoulli_fn:
            img = (img > 0).astype(img.dtype)  # logits: threshold at 0
        k = round(data.shape[1] / 2)
        mse += float(jnp.sum(jnp.mean((img[:, :-k] - data[:, :-k]) ** 2, axis=1)))
        n_data += data.shape[0]
    return mse / n_data


# -- marginal likelihood --------------------------------------------------------


def get_marginal_likelihood(
    gen: GenerativeModel,
    config: dict,
    batches,
    n_samples: int = 5000,
    key=None,
    chunk: int = 100,
) -> float:
    """Monte-Carlo marginal likelihood (reference get_marginal_likelihood,
    training_evaluation.py:177-206): draw ``n_samples`` ancestral logit
    samples (clamped to ±20), compute -BCE(sample_logits, datum) per
    (datum, sample), and log-mean-exp over samples stabilized by the min loss.
    Only the Bernoulli path is live in the reference; the Gaussian path raises
    NotImplementedError there and does here too."""
    if config["loss_fn"] is fe_fn:
        raise NotImplementedError(
            "Gaussian marginal likelihood is not implemented (parity with the "
            "reference, training_evaluation.py:192-196)"
        )
    logits = sample_pc(n_samples, gen, config, key=key, is_return_hidden=True)
    logits = jnp.clip(logits, -20.0, 20.0)  # [S, D]

    @jax.jit
    def batch_losses(data):  # [B, D] -> [B, S]
        # BCE-with-logits summed over features for every (datum, sample) pair
        z = logits  # [S, D]
        pos = jnp.sum(jnp.maximum(z, 0) + jnp.log1p(jnp.exp(-jnp.abs(z))), axis=1)
        # sum_d max(z,0) - z*y + log1p(exp(-|z|)) = pos - data @ z^T
        # full-f32 MXU: the bf16 default's ~2^-8 relative error on this
        # ~1e4-magnitude nat sum would add O(nats) noise to the metric
        return pos[None, :] - jnp.matmul(
            data, z.T, precision=jax.lax.Precision.HIGHEST
        )

    losses = []
    for data, _ in batches:
        for s in range(0, data.shape[0], chunk):
            losses.append(np.asarray(batch_losses(data[s : s + chunk])))
    losses = np.concatenate(losses, axis=0)  # [N, S]
    m = losses.min(axis=1)
    p = np.exp(-(losses - m[:, None])).mean(axis=1)
    return float((np.log(p) - m).mean())


# -- KL estimators ---------------------------------------------------------------


def _pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aa = jnp.sum(a * a, axis=1)[:, None]
    bb = jnp.sum(b * b, axis=1)[None, :]
    # force full-f32 MXU passes: the TPU default (bf16 products) has an
    # absolute error of order |a||b| * 2^-8, which zeroes genuinely nonzero
    # nearest-neighbour distances and turns the KL's log(r/s) into ±inf/nan
    prod = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(aa + bb - 2.0 * prod, 0.0)


def KLdivergence(x, y, chunk: int = 2048) -> float:
    """Pérez-Cruz (2008) nearest-neighbour KL estimate D(P||Q) from samples
    x ~ P [n, d], y ~ Q [m, d] (reference KLdivergence,
    training_evaluation.py:240-284):

        KL ≈ -(d/n) Σ log(r_i / s_i) + log(m / (n-1))

    where r_i is the distance from x_i to its nearest *other* point in x and
    s_i the distance to its nearest point in y.  Brute-force pairwise
    distances (MXU matmuls) replace the host KD-tree."""
    x = jnp.atleast_2d(jnp.asarray(x, dtype=jnp.float32))
    y = jnp.atleast_2d(jnp.asarray(y, dtype=jnp.float32))
    n, d = x.shape
    m, dy = y.shape
    assert d == dy
    # center jointly (KL is translation-invariant): keeps the f32
    # aa+bb-2ab cancellation error proportional to the data SPREAD rather
    # than its distance from the origin
    mu = (jnp.sum(x, axis=0) + jnp.sum(y, axis=0)) / (n + m)
    x = x - mu
    y = y - mu

    @jax.jit
    def nn_dists(xc, x_all, y_all, start):
        dxx = _pairwise_sq_dists(xc, x_all)
        # mask self-distance: row i in this chunk is global index start+i
        rows = jnp.arange(xc.shape[0])[:, None] + start
        cols = jnp.arange(x_all.shape[0])[None, :]
        dxx = jnp.where(rows == cols, jnp.inf, dxx)
        r2 = jnp.min(dxx, axis=1)
        dxy = _pairwise_sq_dists(xc, y_all)
        s2 = jnp.min(dxy, axis=1)
        return r2, s2

    total = 0.0
    for s in range(0, n, chunk):
        xc = x[s : s + chunk]
        r2, s2 = nn_dists(xc, x, y, s)
        r = np.sqrt(np.asarray(r2, dtype=np.float64))
        ss = np.sqrt(np.asarray(s2, dtype=np.float64))
        total += float(np.log(r / ss).sum())
    return -total * d / n + float(np.log(m / (n - 1.0)))


def kl_divergence_discrete(p, q) -> float:
    """KL between discrete distributions (reference kl_divergence_discrete,
    training_evaluation.py:286-300)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    p = p / p.sum()
    q = q / q.sum()
    return float(np.sum(np.where(p != 0, -p * np.log(q / p), 0.0)))


def get_paired_stat(before, after, type: str = "two-sided") -> float:
    """Paired test with a normality gate (reference get_paired_stat,
    training_evaluation.py:303-315): Shapiro on the differences; paired
    t-test if normal (p > .05), Wilcoxon signed-rank otherwise."""
    from scipy import stats
    from scipy.stats import shapiro

    diffs = [a - m for (a, m) in zip(before, after)]
    _, p_norm = shapiro(diffs)
    if p_norm > 0.05:
        _, p = stats.ttest_rel(before, after, alternative=type)
    else:
        _, p = stats.wilcoxon(before, after, alternative=type)
    return float(p)
