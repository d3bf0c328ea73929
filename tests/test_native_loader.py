"""Native C++ data-loader tests (skip cleanly when g++ is unavailable)."""

import gzip
import os
import struct

import numpy as np
import pytest

from montecarlopredictivecoding_tpu.data.native_loader import (
    MODE_BINARIZE,
    MODE_NORMALIZE,
    MODE_SCALE,
    gather_batch,
    native_available,
    preprocess_images,
    read_idx_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native loader (g++) unavailable"
)


def _write_idx(path, arr: np.ndarray):
    arr = arr.astype(np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


@needs_native
def test_native_idx_reader_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(7, 5, 4), dtype=np.uint8)
    path = str(tmp_path / "test-idx3-ubyte")
    _write_idx(path, arr)
    out = read_idx_native(path)
    np.testing.assert_array_equal(out, arr)
    # labels (1-D)
    labels = rng.randint(0, 10, size=(13,)).astype(np.uint8)
    lpath = str(tmp_path / "labels-idx1-ubyte")
    _write_idx(lpath, labels)
    np.testing.assert_array_equal(read_idx_native(lpath), labels)


@needs_native
def test_native_reader_used_by_mnist_loader(tmp_path):
    from montecarlopredictivecoding_tpu.data.mnist import load_mnist_arrays

    rng = np.random.RandomState(1)
    raw = str(tmp_path / "MNIST" / "raw")
    os.makedirs(raw)
    tr_x = rng.randint(0, 256, (50, 28, 28), dtype=np.uint8)
    tr_y = rng.randint(0, 10, (50,)).astype(np.uint8)
    te_x = rng.randint(0, 256, (20, 28, 28), dtype=np.uint8)
    te_y = rng.randint(0, 10, (20,)).astype(np.uint8)
    _write_idx(os.path.join(raw, "train-images-idx3-ubyte"), tr_x)
    _write_idx(os.path.join(raw, "train-labels-idx1-ubyte"), tr_y)
    _write_idx(os.path.join(raw, "t10k-images-idx3-ubyte"), te_x)
    _write_idx(os.path.join(raw, "t10k-labels-idx1-ubyte"), te_y)
    (xtr, ytr), (xte, yte) = load_mnist_arrays(str(tmp_path), allow_synthetic=False)
    np.testing.assert_allclose(xtr, tr_x.astype(np.float32) / 255.0)
    np.testing.assert_array_equal(ytr, tr_y)
    assert xte.shape == (20, 28, 28)


def test_preprocess_modes_match_numpy():
    rng = np.random.RandomState(2)
    raw = rng.randint(0, 256, size=(1 << 15,), dtype=np.uint8)  # > thread cutoff
    x = raw.astype(np.float32) / 255.0
    np.testing.assert_allclose(preprocess_images(raw, MODE_SCALE), x, atol=1e-7)
    np.testing.assert_allclose(
        preprocess_images(raw, MODE_BINARIZE), (x > 0.5).astype(np.float32)
    )
    np.testing.assert_allclose(
        preprocess_images(raw, MODE_NORMALIZE), (x - 0.5) / 0.5, atol=1e-6
    )


def test_gather_batch_matches_numpy():
    rng = np.random.RandomState(3)
    data = rng.randn(100, 17).astype(np.float32)
    idx = rng.randint(0, 100, size=40)
    np.testing.assert_array_equal(gather_batch(data, idx), data[idx])
