"""Data-parallel training through the user-facing epoch driver.

The kernel-level dp equivalence (per-shard fused chain + psum == one big
batch) is pinned by benchmarks/multichip_flagship.py and the dryrun; these
tests pin the layer above it — ``train_mnist.train_mcpc(mesh=N)``: device
placement, the shard_map inside the scanned K-batch chunk, the global grad
normalization, and the CLI guard rails.
"""

import os

import jax
import numpy as np
import pytest

from montecarlopredictivecoding_tpu.experiments import train_mnist

TINY = {
    "T_pc": 5, "mixing": 2, "sampling": 3, "batch_size_train": 64,
    "input_size": 4, "hidden_size": 8, "hidden2_size": 8,
}


@pytest.fixture
def tiny_config(monkeypatch):
    cfg = train_mnist.mcpc_training_config()
    monkeypatch.setattr(
        train_mnist, "mcpc_training_config", lambda: {**cfg, **TINY}
    )


def _quantile_close(a, b, tol=5e-4, frac=0.01, max_abs=0.02):
    """Adam trajectories can't be compared elementwise at tight tolerance
    (near-zero grads sign-flip the ±lr-normalized update on fp rounding —
    same convention as benchmarks/hw_parity.py): require <frac of elements
    outside tol and a bounded worst case."""
    diff = np.abs(np.asarray(a) - np.asarray(b))
    assert np.mean(diff > tol) < frac, (np.mean(diff > tol), diff.max())
    assert diff.max() < max_abs, diff.max()


def test_dp_mesh_training_matches_single_device(tiny_config, tmp_path):
    # noise off -> chains deterministic; the dp run differs from the
    # single-device run only by shard summation order in the psummed grads
    common = dict(
        epochs=1, seed=0, batches_per_epoch=2, log=False, fused=True,
        langevin_var=None,
    )
    g1 = train_mnist.train_mcpc(out=str(tmp_path / "single"), **common)
    g8 = train_mnist.train_mcpc(out=str(tmp_path / "dp"), mesh=8, **common)
    leaves1 = jax.tree_util.tree_leaves(g1.params)
    leaves8 = jax.tree_util.tree_leaves(g8.params)
    assert len(leaves1) == len(leaves8)
    for a, b in zip(leaves1, leaves8):
        _quantile_close(a, b)


def test_dp_mesh_training_with_noise_runs(tiny_config, tmp_path):
    out = str(tmp_path / "dp_noisy")
    gen = train_mnist.train_mcpc(
        epochs=1, out=out, seed=0, batches_per_epoch=2, log=False, mesh=8
    )
    assert os.path.isfile(out + ".msgpack")
    init = train_mnist.get_model(
        train_mnist.apply_preset(
            train_mnist.mcpc_training_config(), "fid", "mcpc"
        ),
        key=0,
    )
    moved = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(gen.params),
            jax.tree_util.tree_leaves(init.params),
        )
    ]
    assert all(np.isfinite(v) for v in moved) and max(moved) > 1e-4


def test_mesh_requires_fused_path():
    with pytest.raises(ValueError, match="fused"):
        train_mnist.train_mcpc(
            epochs=1, out="/tmp/never", mesh=8, fused=False
        )
