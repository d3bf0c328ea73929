"""Posterior covariance factor parameterizations for the DLGM baseline.

Re-expressions of the reference factors
(``/root/reference/Deep_Latent_Gaussian_Models/cholesky_factor.py:4-82``;
the rank-one variant duplicated at ``DLGM.py:43-69`` is the one the DLGM
uses).  Each maps a free-parameter vector to a matrix R with C = R Rᵀ:

* CholeskyFactor — full lower-triangular, ``exp``+δ positive diagonal;
* DiagonalFactor — diagonal only;
* RankOneFactor — ``v vᵀ`` with the diagonal replaced by an independent
  positive vector (free params = [log-diag, log-v]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class CholeskyFactor:
    def __init__(self, size: int, delta: float = 1e-4):
        self.size = size
        self.delta = delta
        self._tril = np.tril_indices(size, k=-1)

    def free_parameter_size(self) -> int:
        return self.size * (self.size + 1) // 2

    def parameterize(self, free: jnp.ndarray) -> jnp.ndarray:
        """[B, size*(size+1)/2] -> [B, size, size] lower triangular."""
        b = free.shape[0]
        diag = jnp.exp(free[:, : self.size]) + self.delta
        off = free[:, self.size :]
        R = jnp.zeros((b, self.size, self.size), dtype=free.dtype)
        rows, cols = self._tril
        R = R.at[:, rows, cols].set(off)
        idx = jnp.arange(self.size)
        return R.at[:, idx, idx].set(diag)


class DiagonalFactor:
    def __init__(self, size: int, delta: float = 1e-6):
        self.size = size
        self.delta = delta

    def free_parameter_size(self) -> int:
        return self.size

    def parameterize(self, free: jnp.ndarray) -> jnp.ndarray:
        diag = jnp.exp(free) + self.delta
        return jnp.eye(self.size, dtype=free.dtype)[None] * diag[:, :, None]


class RankOneFactor:
    """R = v vᵀ off-diagonal, independent positive diagonal
    (reference DLGM.py:43-69)."""

    def __init__(self, size: int, delta: float = 1e-6):
        self.size = size
        self.delta = delta

    def free_parameter_size(self) -> int:
        return 2 * self.size

    def parameterize(self, free: jnp.ndarray) -> jnp.ndarray:
        d = jnp.exp(free[:, : self.size]) + self.delta
        v = jnp.exp(free[:, self.size :]) + self.delta
        R = jnp.einsum("bi,bj->bij", v, v)
        idx = jnp.arange(self.size)
        return R.at[:, idx, idx].set(d)


def factor_from_free_size(latent_dim: int, free_size: int):
    """Identify a reference factor from its free-parameter width — torch
    checkpoints only record the cov head's out-dim (recognition.py:16),
    so imports must infer the class.  Raises on the tiny-d collisions
    (d=1: Cholesky==Diagonal; d=3: Cholesky==RankOne) rather than silently
    picking one and parameterizing garbage; unambiguous for d > 3."""
    matches = [
        cls(latent_dim)
        for cls in (CholeskyFactor, DiagonalFactor, RankOneFactor)
        if cls(latent_dim).free_parameter_size() == free_size
    ]
    if len(matches) == 1:
        return matches[0]
    if matches:
        names = ", ".join(type(m).__name__ for m in matches)
        raise ValueError(
            f"free size {free_size} at latent dim {latent_dim} is ambiguous "
            f"({names}) — pass the factor explicitly"
        )
    raise ValueError(
        f"no factor with free size {free_size} at latent dim {latent_dim}"
    )
