"""Observability: progress logging, the plot-progress diagnostic, profiler
helpers and slow-path warnings.

Reference counterparts (SURVEY.md §5): tqdm postfix logging
(``pc_trainer.py:659-663,929-962``), the plot-progress subsystem rendering
energy/loss/overall vs t per batch (``pc_trainer.py:121-139,964-1062``) with
its "loss absorbed into hidden-layer energy" health check, and the
"this will slow down training" warnings (``predictive_coding/utils.py:8-16``).
TPU-native additions: ``jax.profiler`` trace capture around chains.
"""

from __future__ import annotations

import contextlib
import os
import time
import typing as tp
import warnings

import numpy as np


def slow_down_warning(caller: str, option: str, suggestion: str) -> None:
    """Warn that an expensive option is enabled (reference
    predictive_coding/utils.py:8-16)."""
    warnings.warn(
        f"{caller}: option <{option}> slows down training; set it to "
        f"{suggestion} unless you need it.",
        RuntimeWarning,
        stacklevel=3,
    )


class ProgressLogger:
    """Lightweight per-batch progress reporting (the tqdm-postfix role,
    reference pc_trainer.py:929-962): call with each train_on_batch results
    dict; prints loss/energy/overall and steps/sec."""

    def __init__(self, every: int = 1, prefix: str = ""):
        self.every = every
        self.prefix = prefix
        self.h = 0
        self.history: list = []
        self._t_last = time.perf_counter()

    def __call__(self, results: dict, T: tp.Optional[int] = None) -> None:
        now = time.perf_counter()
        dt = now - self._t_last
        self._t_last = now
        row = {
            "h": self.h,
            "loss": float(np.asarray(results["loss"])[-1]),
            "energy": float(np.asarray(results["energy"])[-1]),
            "overall": float(np.asarray(results["overall"])[-1]),
            "seconds": dt,
        }
        if T:
            row["steps_per_sec"] = T / dt
        self.history.append(row)
        if self.h % self.every == 0:
            msg = (
                f"{self.prefix}h={row['h']} | l: {row['loss']:.3e} | "
                f"e: {row['energy']:.3e} | o: {row['overall']:.3e} | "
                f"{dt:.2f}s"
            )
            if T:
                msg += f" | {row['steps_per_sec']:,.0f} steps/s"
            print(msg)
        self.h += 1


def plot_progress(
    per_batch_results: tp.Sequence[dict],
    path: tp.Optional[str] = None,
    title: str = "inference progress",
):
    """The reference's plot-progress diagnostic (pc_trainer.py:964-1062):
    loss / energy / overall vs inference step t, one line per batch h.

    A healthy run shows, per h, loss decreasing and energy increasing along t
    (loss being absorbed into hidden-layer energy), overall decreasing, and
    the loss curves dropping as h grows (weight updates taking in the
    energy) — the health criteria documented at pc_trainer.py:131-139.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 3, figsize=(12, 3.5), sharex=True)
    keys = ["loss", "energy", "overall"]
    n = len(per_batch_results)
    cmap = plt.get_cmap("viridis")
    for h, results in enumerate(per_batch_results):
        color = cmap(h / max(n - 1, 1))
        for ax, key in zip(axs, keys):
            ax.plot(np.asarray(results[key]), color=color, alpha=0.8)
    for ax, key in zip(axs, keys):
        ax.set_xlabel("t")
        ax.set_title(key)
    fig.suptitle(title)
    fig.tight_layout()
    if path is None:
        working_home = os.environ.get("WORKING_HOME", ".")
        os.makedirs(os.path.join(working_home, "plot_progress"), exist_ok=True)
        path = os.path.join(working_home, "plot_progress", "combined.png")
    fig.savefig(path)
    plt.close(fig)
    return path


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/mcpc_profile"):
    """Capture a ``jax.profiler`` trace around a block (view with
    TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def energy_absorption_report(per_batch_results: tp.Sequence[dict]) -> dict:
    """Quantify the "loss absorbed into hidden energy" health check: per
    batch, the fraction of the initial loss that moved into layer energy by
    the last step, plus monotonicity of overall."""
    rows = []
    for results in per_batch_results:
        loss = np.asarray(results["loss"], dtype=np.float64)
        energy = np.asarray(results["energy"], dtype=np.float64)
        overall = np.asarray(results["overall"], dtype=np.float64)
        denom = max(loss[0] - loss[-1], 1e-12)
        rows.append(
            {
                "loss_drop": float(loss[0] - loss[-1]),
                "energy_rise": float(energy[-1] - energy[0]),
                "absorption": float((energy[-1] - energy[0]) / denom),
                "overall_monotone_frac": float(np.mean(np.diff(overall) <= 0)),
            }
        )
    return {
        "per_batch": rows,
        "mean_absorption": float(np.mean([r["absorption"] for r in rows])),
        "mean_overall_monotone_frac": float(
            np.mean([r["overall_monotone_frac"] for r in rows])
        ),
    }
