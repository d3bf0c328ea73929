"""Legacy DLGM module zoo (upstream-style stacked chains).

Capability parity with ``/root/reference/Deep_Latent_Gaussian_Models/
generative.py`` / ``recognition.py`` / ``losses.py`` / ``metrics.py``:

* :func:`init_generative_stacked` — ``h₀ = G₀(z₀)``, ``h' = T(h) + G(z)``
  with two-Linear ReLU ``T`` blocks and a two-Linear output head, sigmoid
  probabilities (generative.py:31-109); preset MNIST configs
  (generative.py:112-142);
* :func:`init_recognition_stacked` — one recognition net per level with a
  Cholesky-family covariance factor, reparameterized sampling and exact
  ``log_prob`` (recognition.py:34-65);
* :func:`stacked_loss` — the summed-BCE + full-covariance-KL ELBO
  (losses.py:7-32);
* :class:`StackedMetrics` — fid / linear-probe accuracy plus full
  implementations of the masked-MSE and marginal-likelihood metrics that are
  stubs upstream (metrics.py:138-142).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .cholesky import CholeskyFactor
from .dlgm import _apply, _linear_init, dlgm_loss

Array = jax.Array

# -- generative ------------------------------------------------------------------


def init_generative_stacked(
    key,
    hidden_dim_list,
    latent_dim_list,
    T_hidden_dim_list,
    output_dim: int,
):
    ks = jax.random.split(key, 2 * len(hidden_dim_list) + 2)
    ki = iter(ks)
    G = [
        _linear_init(next(ki), ld, hd)
        for hd, ld in zip(hidden_dim_list, latent_dim_list)
    ]
    T = [
        {
            "a": _linear_init(next(ki), h_prev, t_h),
            "b": _linear_init(next(ki), t_h, h_next),
        }
        for h_prev, h_next, t_h in zip(
            hidden_dim_list[:-1], hidden_dim_list[1:], T_hidden_dim_list[:-1]
        )
    ]
    final = {
        "a": _linear_init(next(ki), hidden_dim_list[-1], T_hidden_dim_list[-1]),
        "b": _linear_init(next(ki), T_hidden_dim_list[-1], output_dim),
    }
    return {
        "G": G,
        "T": T,
        "final": final,
        "latent_dim_list": tuple(latent_dim_list),
    }


def generative_stacked_forward(params, z_list) -> Array:
    h = _apply(params["G"][0], z_list[0])
    for G_p, T_p, z in zip(params["G"][1:], params["T"], z_list[1:]):
        h = jax.nn.relu(_apply(T_p["b"], jax.nn.relu(_apply(T_p["a"], h))))
        h = h + _apply(G_p, z)
    logits = _apply(
        params["final"]["b"], jax.nn.relu(_apply(params["final"]["a"], h))
    )
    return jax.nn.sigmoid(logits)


def sample_prior_stacked(key, batch: int, latent_dim_list) -> list:
    keys = jax.random.split(key, len(latent_dim_list))
    return [jax.random.normal(k, (batch, d)) for k, d in zip(keys, latent_dim_list)]


def log_prob_prior(z_list) -> Array:
    out = 0.0
    for z in z_list:
        out = out + jnp.sum(
            -0.5 * z**2 - 0.5 * jnp.log(2 * jnp.pi), axis=-1
        )
    return out


# MNIST presets (reference generative.py:112-142)
MNIST_PRESETS = {
    "mnist": dict(hidden_dim_list=[201, 200], latent_dim_list=[201, 200],
                  T_hidden_dim_list=[203, 202], output_dim=784),
    "mnist_large": dict(hidden_dim_list=[201, 200], latent_dim_list=[201, 200],
                        T_hidden_dim_list=[1002, 1001], output_dim=784),
    "mnist_vae": dict(hidden_dim_list=[20], latent_dim_list=[20],
                      T_hidden_dim_list=[400], output_dim=784),
    "mnist_vae_large": dict(hidden_dim_list=[200], latent_dim_list=[200],
                            T_hidden_dim_list=[1000], output_dim=784),
}

# recognition presets (reference recognition.py:67-86)
RECOGNITION_PRESETS = {
    "mnist": dict(latent_dim_list=[201, 200], hidden_dim_list=[400, 400]),
    "mnist_vae": dict(latent_dim_list=[20], hidden_dim_list=[400]),
    "mnist_vae_large": dict(latent_dim_list=[200], hidden_dim_list=[1000]),
}


# -- recognition ------------------------------------------------------------------


def init_recognition_stacked(
    key,
    latent_dim_list,
    hidden_dim_list,
    factor_cls=CholeskyFactor,
    input_dim: int = 784,
):
    nets = []
    factors = []
    for k, ld, hd in zip(
        jax.random.split(key, len(latent_dim_list)), latent_dim_list, hidden_dim_list
    ):
        factor = factor_cls(ld)
        k1, k2, k3 = jax.random.split(k, 3)
        nets.append(
            {
                "fc1": _linear_init(k1, input_dim, hd),
                "mu": _linear_init(k2, hd, ld),
                "cov": _linear_init(k3, hd, factor.free_parameter_size()),
            }
        )
        factors.append(factor)
    return {"nets": nets}, factors


def recognition_stacked_forward(params, factors, x):
    mus, Rs = [], []
    for net, factor in zip(params["nets"], factors):
        h = jax.nn.relu(_apply(net["fc1"], x))
        mus.append(_apply(net["mu"], h))
        Rs.append(factor.parameterize(_apply(net["cov"], h)))
    return mus, Rs


def recognition_sample_stacked(key, mus, Rs) -> list:
    keys = jax.random.split(key, len(mus))
    return [
        mu + jnp.einsum("bij,bj->bi", R, jax.random.normal(k, mu.shape))
        for k, mu, R in zip(keys, mus, Rs)
    ]


def recognition_log_prob(z_list, mus, Rs) -> Array:
    """Exact multivariate-normal log-density of z under N(mu, R Rᵀ)
    (reference recognition.py:58-65 via torch MultivariateNormal)."""
    out = 0.0
    for z, mu, R in zip(z_list, mus, Rs):
        diff = z - mu
        y = jnp.linalg.solve(R, diff[..., None])[..., 0]
        sign, logdet = jnp.linalg.slogdet(R)
        out = out + (
            -0.5 * jnp.sum(y * y, axis=-1)
            - logdet
            - 0.5 * z.shape[-1] * jnp.log(2 * jnp.pi)
        )
    return out


stacked_loss = dlgm_loss  # identical ELBO (reference losses.py == DLGM.py:18-41)


# -- metrics ----------------------------------------------------------------------


class StackedMetrics:
    """Metrics over a (generative, recognition) stacked pair
    (reference metrics.py:70-142, with the upstream get_mse_rec /
    get_marginal_likelihood stubs implemented for real)."""

    def __init__(self, gen_params, rec_params, factors, key=0):
        self.gen_params = gen_params
        self.rec_params = rec_params
        self.factors = factors
        self._key = jax.random.PRNGKey(key) if isinstance(key, int) else key

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def generate(self, num_samples: int, is_return_hidden: bool = False):
        k1, k2 = jax.random.split(self.next_key())
        z = sample_prior_stacked(k1, num_samples, self.gen_params["latent_dim_list"])
        probs = generative_stacked_forward(self.gen_params, z)
        if is_return_hidden:
            return probs
        return (jax.random.uniform(k2, probs.shape) <= probs).astype(jnp.float32)

    def get_fid(self, num_samples=5000, is_test=False, feature_fn=None,
                root="MNIST_data") -> float:
        from ..eval.fid import compute_fid, compute_stats, make_mnist_fid_stats, pixel_features

        feature_fn = feature_fn or pixel_features
        val_stats, test_stats = make_mnist_fid_stats(feature_fn, root=root)
        imgs = np.asarray(self.generate(num_samples, is_return_hidden=True))
        stats = compute_stats(feature_fn(imgs))
        return compute_fid(stats, test_stats if is_test else val_stats)

    def get_acc(self, batches):
        from ..eval.classifier import train_linear_classifier

        reps, labels = [], []
        for data, label in batches:
            mus, _ = recognition_stacked_forward(self.rec_params, self.factors, data)
            reps.append(np.asarray(mus[0]))
            labels.append(np.asarray(label))
        clf, best = train_linear_classifier(np.concatenate(reps), np.concatenate(labels), epochs=20)
        return best, clf

    def get_mse_rec(self, batches) -> float:
        mse, n = 0.0, 0
        for data, _ in batches:
            k = round(data.shape[1] / 2)
            masked = data.at[:, :-k].set(0.0)
            mus, _ = recognition_stacked_forward(self.rec_params, self.factors, masked)
            x_hat = generative_stacked_forward(self.gen_params, mus)
            x_hat = (x_hat > 0.5).astype(x_hat.dtype)
            mse += float(jnp.sum(jnp.mean((x_hat[:, :-k] - data[:, :-k]) ** 2, axis=1)))
            n += data.shape[0]
        return mse / n

    def get_marginal_likelihood(self, batches, n_samples=5000, chunk=100) -> float:
        probs = self.generate(n_samples, is_return_hidden=True)
        eps = 1e-7
        probs = jnp.clip(probs, eps, 1 - eps)
        logits = jnp.clip(jnp.log(probs / (1 - probs)), -20.0, 20.0)

        @jax.jit
        def batch_losses(data):
            pos = jnp.sum(jnp.maximum(logits, 0) + jnp.log1p(jnp.exp(-jnp.abs(logits))), axis=1)
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

    def importance_nll(self, batches, particle_size: int = 16) -> float:
        """Importance-sampled −ln p(v) with per-datum particle replicas and
        logsumexp over particles (reference evaluate.py:65-104)."""
        gen_params, rec_params, factors = self.gen_params, self.rec_params, self.factors

        @jax.jit
        def nll(data, key):
            B = data.shape[0]
            rep = jnp.repeat(data, particle_size, axis=0)
            mus, Rs = recognition_stacked_forward(rec_params, factors, rep)
            z = recognition_sample_stacked(key, mus, Rs)
            # torch-BCE -100 clamp semantics, shared with the simple DLGM
            # (reference evaluate.py:80 uses -F.binary_cross_entropy)
            from .dlgm import _bce_logs

            log_r, log_1mr = _bce_logs(generative_stacked_forward(gen_params, z))
            log_px_z = jnp.sum(rep * log_r + (1 - rep) * log_1mr, axis=1)
            log_w = log_px_z + log_prob_prior(z) - recognition_log_prob(z, mus, Rs)
            log_w = log_w.reshape(B, particle_size)
            log_px = jax.scipy.special.logsumexp(log_w, axis=1) - jnp.log(particle_size)
            return -jnp.sum(log_px)

        total, n = 0.0, 0
        for data, _ in batches:
            total += float(nll(data, self.next_key()))
            n += data.shape[0]
        return total / n
