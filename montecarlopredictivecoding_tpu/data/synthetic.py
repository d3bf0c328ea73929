"""Synthetic stimulus datasets for the neural-variability experiments.

Functional re-expressions of the reference dataset classes
(``/root/reference/utils/data.py:52-110``): instead of per-item ``Dataset``
objects they materialize whole arrays (TPU-friendly dense batches).
"""

from __future__ import annotations

import numpy as np


def grating_dataset(
    num_samples: int,
    size: int = 28,
    num_orientations: int = 8,
    wavelength: float = 10.0,
    seed: int = 0,
) -> np.ndarray:
    """Sinusoidal gratings at random orientations in [0, 1], flattened
    (reference GratingDataset, utils/data.py:52-84)."""
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, num_orientations, size=num_samples)
    angles = (2 * np.pi / num_orientations) * idx
    x, y = np.meshgrid(np.arange(size), np.arange(size))
    c = size // 2
    out = np.empty((num_samples, size * size), dtype=np.float32)
    for i, a in enumerate(angles):
        x_rot = (x - c) * np.cos(a) + (y - c) * np.sin(a)
        g = np.sin(2 * np.pi * x_rot / wavelength) / 2 + 0.5
        out[i] = g.astype(np.float32).ravel()
    return out


def noise_dataset(num_samples: int, size: int = 28, seed: int = 0) -> np.ndarray:
    """A single fixed binary-noise image repeated ``num_samples`` times — the
    reference NoiseDataset always returns item 0 (utils/data.py:86-97)."""
    rng = np.random.RandomState(seed)
    img = (rng.rand(size, size) > 0.5).astype(np.float32).ravel()
    return np.tile(img[None, :], (num_samples, 1))


def chunk_dataset(tensor: np.ndarray, chunk_size: int) -> list:
    """Split the leading axis into chunks of ``chunk_size`` (last chunk may
    be short) — reference ChunkDataset (utils/data.py:99-110)."""
    n = tensor.shape[0]
    return [tensor[s : min(s + chunk_size, n)] for s in range(0, n, chunk_size)]
