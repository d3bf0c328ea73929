"""Deep Latent Gaussian Model (DLGM) baseline — the reference's VAE-family
comparison model (``/root/reference/Deep_Latent_Gaussian_Models/DLGM.py``).

Structure parity:

* Generative chain (DLGM.py:79-121): learned bias b₀; ``h ← T_l(h) + z_l``
  where ``T_l = Linear ∘ ReLU`` and the latent injections are identity maps;
  output ``sigmoid(Linear(ReLU(h)))``; standard-normal priors per level.
* Recognition (DLGM.py:168-214): one net per latent level
  (fc1 → ReLU → {mu head, covariance-free-params head}); reparameterized
  sample ``z = mu + R eps``; covariance via a Cholesky-family factor
  (rank-one by default, DLGM.py:224).
* ELBO (DLGM.py:18-41): summed BCE + Σ_l KL(N(mu, RRᵀ) ‖ N(0, I)) with the
  full-covariance correction ``0.5 (|mu|² + tr(RRᵀ) − 2 Σ log diag R − d)``.
* Recognition width solved so recognition ≈ factor × generative params
  (DLGM.py:230-233).
* Metrics mirror the MCPC ones: FID, linear-probe accuracy on mu[0],
  masked-reconstruction MSE, Monte-Carlo marginal likelihood, plus the
  importance-sampled −ln p(v) estimator from ``evaluate.py:65-104``.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .cholesky import RankOneFactor
from ..core.losses import _bce_with_logits

Array = jax.Array


def _linear_init(key, din, dout, dtype=jnp.float32):
    bound = 1.0 / (din ** 0.5)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (dout,), dtype, -bound, bound),
    }


def _apply(p, x):
    return x @ p["w"] + p["b"]


# -- generative chain ------------------------------------------------------------


def init_generative(key, input_dim: int = 784, dim_list=(20, 128, 128)):
    keys = jax.random.split(key, len(dim_list) + 1)
    params = {
        "bias": jnp.zeros((dim_list[0],)),
        "T": [
            _linear_init(keys[i], dim_list[i], dim_list[i + 1])
            for i in range(len(dim_list) - 1)
        ],
        "final": _linear_init(keys[-1], dim_list[-1], input_dim),
    }
    return params


def generative_forward(params, z_list) -> Array:
    """h₀ = b + z₀; h_{l+1} = T_l(ReLU... ) — reference applies
    ``T = ReLU then Linear`` (DLGM.py:92-98) and sigmoid at the output.

    Params carrying ``fc3``/``fc4`` are the reference's SIMPLE
    GenerativeModel (generative.py:5-16, the topology of the shipped
    checkpoint): probs = sigmoid(fc4(relu(fc3(z)))) with a single latent
    level (note: no ReLU on z itself, unlike the stacked head)."""
    if "fc3" in params:
        z = z_list[0] if isinstance(z_list, (list, tuple)) else z_list
        h = jax.nn.relu(_apply(params["fc3"], z))
        return jax.nn.sigmoid(_apply(params["fc4"], h))
    h = params["bias"][None, :] + z_list[0]
    for T_p, z in zip(params["T"], z_list[1:]):
        h = _apply(T_p, jax.nn.relu(h)) + z
    logits = _apply(params["final"], jax.nn.relu(h))
    return jax.nn.sigmoid(logits)


def sample_prior(key, batch: int, dim_list) -> list:
    keys = jax.random.split(key, len(dim_list))
    return [
        jax.random.normal(k, (batch, d)) for k, d in zip(keys, dim_list)
    ]


# -- recognition -----------------------------------------------------------------


def init_recognition(
    key,
    input_dim: int,
    latent_dim_list,
    hidden_dim: int,
    factor_cls=RankOneFactor,
):
    nets = []
    factors = []
    keys = jax.random.split(key, len(latent_dim_list))
    for k, d in zip(keys, latent_dim_list):
        factor = factor_cls(d)
        k1, k2, k3 = jax.random.split(k, 3)
        nets.append(
            {
                "fc1": _linear_init(k1, input_dim, hidden_dim),
                "mu": _linear_init(k2, hidden_dim, d),
                "cov": _linear_init(k3, hidden_dim, factor.free_parameter_size()),
            }
        )
        factors.append(factor)
    return {"nets": nets}, factors


def recognition_forward(params, factors, x):
    mus, Rs = [], []
    shared = params.get("body")  # shared-input-body variant (DLGM.py:141-166)
    for net, factor in zip(params["nets"], factors):
        h = jax.nn.relu(_apply(shared if shared is not None else net["fc1"], x))
        mus.append(_apply(net["mu"], h))
        Rs.append(factor.parameterize(_apply(net["cov"], h)))
    return mus, Rs


def init_recognition_shared(
    key,
    input_dim: int,
    latent_dim_list,
    hidden_dim: int,
    factor_cls=RankOneFactor,
):
    """Shared-body recognition (reference RecognitionModelsShared,
    DLGM.py:141-166): one Linear body, per-level mu/cov heads."""
    k_body, k_rest = jax.random.split(key)
    params, factors = init_recognition(
        k_rest, input_dim, latent_dim_list, hidden_dim, factor_cls
    )
    for net in params["nets"]:
        del net["fc1"]
    params["body"] = _linear_init(k_body, input_dim, hidden_dim)
    return params, factors


def recognition_sample(key, mus, Rs):
    keys = jax.random.split(key, len(mus))
    return [
        mu + jnp.einsum("bij,bj->bi", R, jax.random.normal(k, mu.shape))
        for k, mu, R in zip(keys, mus, Rs)
    ]


# -- ELBO --------------------------------------------------------------------------


def _bce_logs(recon: Array):
    """(log recon, log(1-recon)) with torch ``binary_cross_entropy``'s exact
    clamp semantics — each log term floored at -100 (torch clamps log(0) to
    -100 rather than clipping the probability; parity-tested against the
    reference's trained checkpoint in test_dlgm_reference_checkpoint.py).
    Saturated probabilities (exactly 0/1 in f32) take the constant branch,
    so gradients stay finite (no 0·inf)."""
    log_r = jnp.where(
        recon > 0.0,
        jnp.maximum(jnp.log(jnp.where(recon > 0.0, recon, 1.0)), -100.0),
        -100.0,
    )
    om = 1.0 - recon
    log_1mr = jnp.where(
        om > 0.0,
        jnp.maximum(jnp.log(jnp.where(om > 0.0, om, 1.0)), -100.0),
        -100.0,
    )
    return log_r, log_1mr


def dlgm_loss(recon: Array, x: Array, mus, Rs) -> Array:
    """Summed BCE + Σ_l full-covariance KL to the standard-normal prior
    (reference loss_function, DLGM.py:18-41 == losses.py:8-31; BCE log
    terms carry torch's -100 clamp semantics via :func:`_bce_logs`).

    QUIRK preserved: the reference's KL subtracts **1 per datum**, not the
    latent dimension d (``... -1`` inside ``torch.sum`` over the batch,
    DLGM.py:39) — the textbook KL would subtract d.  The difference is the
    constant 0.5·(d−1) per datum (zero gradient), but reported ELBO values
    only match the reference with the quirk, and the trained-checkpoint
    parity test (test_dlgm_reference_checkpoint.py::test_elbo_loss_parity)
    pins it."""
    log_r, log_1mr = _bce_logs(recon)
    bce = -jnp.sum(x * log_r + (1.0 - x) * log_1mr)
    kld = 0.0
    for mu, R in zip(mus, Rs):
        tr = jnp.sum(R * R, axis=(-2, -1))  # tr(RRᵀ)
        idx = jnp.arange(R.shape[-1])
        logdiag = jnp.log(R[:, idx, idx])
        kld += 0.5 * jnp.sum(
            jnp.sum(mu * mu, axis=-1) + tr - 2.0 * jnp.sum(logdiag, axis=-1)
            - 1.0
        )
    return bce + kld


# -- facade ------------------------------------------------------------------------


def optimal_hidden_dim_recog(latent_dim_list, n_gen: int, input_dim: int = 784, factor: int = 3) -> int:
    """Solve the recognition hidden width so total recognition params ≈
    factor × generative params (reference DLGM.py:230-233)."""
    L = len(latent_dim_list)
    s = sum(latent_dim_list)
    return (factor * n_gen - 3 * s) // (L * input_dim + 3 * s + L)


class DLGM:
    """Train/eval/generate/metrics facade (reference DLGM.py:216-393)."""

    def __init__(
        self,
        input_dim: int = 784,
        hidden_dim: int = 128,
        latent_dim: int = 20,
        factor_recog: int = 3,
        lr: float = 1e-3,
        factor_cls=RankOneFactor,
        key: tp.Union[int, Array] = 0,
    ):
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        self._key = key
        self.input_dim = input_dim
        self.latent_dim_list = [latent_dim, hidden_dim, hidden_dim]

        k_gen, k_rec = jax.random.split(self.next_key())
        self.gen_params = init_generative(
            k_gen, input_dim, tuple(self.latent_dim_list)
        )
        n_gen = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(self.gen_params))
        h = optimal_hidden_dim_recog(
            self.latent_dim_list, n_gen, input_dim, factor_recog
        )
        self.rec_params, self.factors = init_recognition(
            k_rec, input_dim, self.latent_dim_list, h, factor_cls
        )
        self.set_optimizer(lr)
        self._train_step = None

    def next_key(self) -> Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def set_optimizer(self, lr: float, decay: float = 0.0):
        tx = optax.adam(lr)
        if decay:
            tx = optax.chain(optax.add_decayed_weights(decay), tx)
        self.tx = tx
        self.opt_state = tx.init((self.gen_params, self.rec_params))
        self._train_step = None

    def get_nparameters(self) -> dict:
        ng = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(self.gen_params))
        nr = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(self.rec_params))
        return {"#total": ng + nr, "#generative": ng, "#recognition": nr}

    def _make_train_step(self):
        factors = self.factors
        tx = self.tx

        @jax.jit
        def step(gen_params, rec_params, opt_state, x, key):
            def loss_fn(gp, rp):
                mus, Rs = recognition_forward(rp, factors, x)
                z = recognition_sample(key, mus, Rs)
                recon = generative_forward(gp, z)
                return dlgm_loss(recon, x, mus, Rs)

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                gen_params, rec_params
            )
            updates, opt_state = tx.update(
                grads, opt_state, (gen_params, rec_params)
            )
            gp, rp = optax.apply_updates((gen_params, rec_params), updates)
            return gp, rp, opt_state, loss

        return step

    def train(self, train_batches, epochs: int, log: bool = True):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        for epoch in range(1, epochs + 1):
            total, count = 0.0, 0
            for data, _ in train_batches:
                self.gen_params, self.rec_params, self.opt_state, loss = (
                    self._train_step(
                        self.gen_params,
                        self.rec_params,
                        self.opt_state,
                        data,
                        self.next_key(),
                    )
                )
                total += float(loss)
                count += data.shape[0]
            if log:
                print(f"====> Epoch: {epoch} Average loss: {total / count:.4f}")

    def test_elbo(self, batches) -> float:
        factors = self.factors

        @jax.jit
        def eval_loss(gp, rp, x, key):
            mus, Rs = recognition_forward(rp, factors, x)
            z = recognition_sample(key, mus, Rs)
            recon = generative_forward(gp, z)
            return dlgm_loss(recon, x, mus, Rs)

        total, count = 0.0, 0
        for data, _ in batches:
            total += float(
                eval_loss(self.gen_params, self.rec_params, data, self.next_key())
            )
            count += data.shape[0]
        return total / count

    def generate_samples(self, num_samples: int, is_return_hidden: bool = False, key=None):
        """Prior -> probabilities (is_return_hidden) or Bernoulli samples
        (reference generate_samples, DLGM.py:294-300)."""
        if key is None:
            key = self.next_key()
        k1, k2 = jax.random.split(key)
        z = sample_prior(k1, num_samples, self.latent_dim_list)
        probs = generative_forward(self.gen_params, z)
        side = int(round(self.input_dim ** 0.5))
        shape = (-1, side, side) if side * side == self.input_dim else (-1, self.input_dim)
        if is_return_hidden:
            return probs.reshape(shape)
        bern = (jax.random.uniform(k2, probs.shape) <= probs).astype(jnp.float32)
        return bern.reshape(shape)

    def get_fid(self, num_samples: int = 5000, is_test: bool = False, feature_fn=None, root: str = "MNIST_data") -> float:
        from ..eval.fid import compute_fid, compute_stats, make_mnist_fid_stats, pixel_features

        if feature_fn is None:
            feature_fn = pixel_features
        val_stats, test_stats = make_mnist_fid_stats(feature_fn, root=root)
        images = np.asarray(self.generate_samples(num_samples, is_return_hidden=True))
        stats = compute_stats(feature_fn(images))
        return compute_fid(stats, test_stats if is_test else val_stats)

    def get_acc(self, batches) -> tp.Tuple[float, tp.Any]:
        """Linear probe accuracy on the first-level posterior mean
        (reference get_acc, DLGM.py:329-359)."""
        from ..eval.classifier import train_linear_classifier

        reps, labels = [], []
        for data, label in batches:
            mus, _ = recognition_forward(self.rec_params, self.factors, data)
            reps.append(np.asarray(mus[0]))
            labels.append(np.asarray(label))
        reps = np.concatenate(reps)
        labels = np.concatenate(labels)
        clf, best = train_linear_classifier(reps, labels, epochs=50)
        return best, clf

    def get_mse_rec(self, batches) -> float:
        """Masked-reconstruction MSE: zero the hidden half, recognize from the
        masked image, decode the posterior means, threshold at 0.5
        (reference get_mse_rec, DLGM.py:361-373)."""
        mse, n = 0.0, 0
        for data, _ in batches:
            k = round(data.shape[1] / 2)
            masked = data.at[:, :-k].set(0.0)
            mus, _ = recognition_forward(self.rec_params, self.factors, masked)
            x_hat = generative_forward(self.gen_params, mus)
            x_hat = (x_hat > 0.5).astype(x_hat.dtype)
            mse += float(
                jnp.sum(jnp.mean((x_hat[:, :-k] - data[:, :-k]) ** 2, axis=1))
            )
            n += data.shape[0]
        return mse / n

    def get_marginal_likelihood(self, batches, n_samples: int = 5000, chunk: int = 100) -> float:
        """Monte-Carlo marginal likelihood from prior samples
        (reference get_marginal_likelihood, DLGM.py:375-393): logit-transform
        the generated probabilities, clamp to ±20, log-mean-exp of -BCE."""
        probs = self.generate_samples(n_samples, is_return_hidden=True).reshape(
            n_samples, -1
        )
        eps = 1e-7
        probs = jnp.clip(probs, eps, 1 - eps)
        logits = jnp.clip(jnp.log(probs / (1 - probs)), -20.0, 20.0)

        @jax.jit
        def batch_losses(data):
            pos = jnp.sum(
                jnp.maximum(logits, 0) + jnp.log1p(jnp.exp(-jnp.abs(logits))),
                axis=1,
            )
            # full-f32 MXU (see eval/metrics.py: bf16 would add O(nats))
            return pos[None, :] - jnp.matmul(
                data, logits.T, precision=jax.lax.Precision.HIGHEST
            )

        losses = []
        for data, _ in batches:
            for s in range(0, data.shape[0], chunk):
                losses.append(np.asarray(batch_losses(data[s : s + chunk])))
        losses = np.concatenate(losses, axis=0)
        m = losses.min(axis=1)
        p = np.exp(-(losses - m[:, None])).mean(axis=1)
        return float((np.log(p) - m).mean())

    def evaluate_importance_nll(self, batches, particle_size: int = 16) -> float:
        """Importance-sampled −ln p(v): replicate each datum over particles
        drawn from the recognition posterior, logsumexp over particles
        (reference evaluate.py:65-104)."""
        factors = self.factors

        @jax.jit
        def nll(gp, rp, data, key):
            B = data.shape[0]
            rep = jnp.repeat(data, particle_size, axis=0)  # [B*P, D]
            mus, Rs = recognition_forward(rp, factors, rep)
            z = recognition_sample(key, mus, Rs)
            recon = generative_forward(gp, z)
            # torch-BCE clamp semantics (reference evaluate.py:80 uses
            # -F.binary_cross_entropy(..., reduction='none'))
            log_r, log_1mr = _bce_logs(recon)
            log_px_z = jnp.sum(rep * log_r + (1 - rep) * log_1mr, axis=1)
            log_prior = sum(
                -0.5 * jnp.sum(zz * zz, axis=1)
                - 0.5 * zz.shape[1] * jnp.log(2 * jnp.pi)
                for zz in z
            )
            log_q = 0.0
            for zz, mu, R in zip(z, mus, Rs):
                diff = zz - mu
                # QUIRK-faithful q-density: the reference scores particles
                # with MultivariateNormal(scale_tril=R).log_prob
                # (recognition.py:30-32), whose triangular solve reads ONLY
                # tril(R) — while its sampler uses the FULL R (einsum,
                # recognition.py:26-28).  For CholeskyFactor the two agree;
                # for the dense RankOneFactor the reference's q-PDF thus
                # doesn't match its own sampler, and parity means mirroring
                # that: solve_triangular(lower) + diag logdet, NOT a dense
                # solve.
                y = jax.scipy.linalg.solve_triangular(
                    R, diff[..., None], lower=True
                )[..., 0]
                idx = jnp.arange(R.shape[-1])
                logdet = jnp.sum(jnp.log(jnp.abs(R[:, idx, idx])), axis=1)
                log_q += (
                    -0.5 * jnp.sum(y * y, axis=1)
                    - logdet
                    - 0.5 * zz.shape[1] * jnp.log(2 * jnp.pi)
                )
            log_w = (log_px_z + log_prior - log_q).reshape(B, particle_size)
            log_px = jax.scipy.special.logsumexp(log_w, axis=1) - jnp.log(
                particle_size
            )
            return -jnp.sum(log_px)

        total, n = 0.0, 0
        for data, _ in batches:
            total += float(
                nll(self.gen_params, self.rec_params, data, self.next_key())
            )
            n += data.shape[0]
        return total / n
