"""Direct coverage for the plotting kit and the DLGM evaluation CLI —
the two surfaces previously exercised only indirectly through the figure
drivers (reference counterparts: utils/plotting.py, evaluate.py)."""

import contextlib
import io
import os
import sys

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from montecarlopredictivecoding_tpu.utils import plotting


def test_proba_to_coordinate_geometry():
    # a one-hot probability sits exactly on its class vertex
    one_hot = np.zeros((1, 10))
    one_hot[0, 3] = 1.0
    (x, y), (cx, cy) = plotting.proba_to_coordinate(one_hot)
    assert np.allclose([x[0], y[0]], [cx[3], cy[3]])
    # the uniform distribution sits at the origin (vertex mean of a
    # regular 10-gon)
    (x, y), _ = plotting.proba_to_coordinate(np.full((1, 10), 0.1))
    assert abs(x[0]) < 1e-12 and abs(y[0]) < 1e-12
    # 1-D input is promoted to a batch of one
    (x1, _), _ = plotting.proba_to_coordinate(one_hot[0])
    assert x1.shape == (1,)


def test_generate_video_writes_gif(tmp_path):
    frames = [np.random.default_rng(i).random((8, 8)) for i in range(3)]
    plotting.generate_video(
        frames, save=True, file_name="clip", out_dir=str(tmp_path), fps=10
    )
    out = tmp_path / "clip.gif"
    assert out.is_file() and out.stat().st_size > 0
    assert out.read_bytes()[:6] in (b"GIF87a", b"GIF89a")


def test_animate_frames_writes_gif(tmp_path):
    path = str(tmp_path / "anim.gif")

    def render(i, ax):
        ax.plot([0, 1], [0, i])

    plotting.animate_frames(render, n_frames=3, path=path, fps=10)
    assert os.path.getsize(path) > 0


def test_plot_line_with_arrow_adds_patch():
    import matplotlib.patches as patches

    fig, ax = plt.subplots()
    x = np.linspace(0.0, 1.0, 20)
    plotting.plot_line_with_arrow(x, x**2, ax=ax, dx=3)
    arrows = [p for p in ax.patches if isinstance(p, patches.FancyArrow)]
    assert len(arrows) == 1
    plt.close(fig)


def test_setup_fig_styles():
    fig = plt.figure()
    plt.gca()
    plotting.setup_fig(zero=False, square=False)
    assert matplotlib.pylab.rcParams["axes.labelsize"] == 16
    assert not plt.gca().spines["top"].get_visible()
    plt.close(fig)


def test_dlgm_evaluate_cli_end_to_end(tmp_path, monkeypatch):
    """The CLI surface itself: save a native checkpoint, evaluate it
    through main() (synthetic-MNIST fallback data), parse the printed
    -ln p(v)."""
    from montecarlopredictivecoding_tpu.experiments import dlgm_evaluate
    from montecarlopredictivecoding_tpu.models.dlgm import DLGM
    from montecarlopredictivecoding_tpu.utils.checkpoint import save_checkpoint

    hidden, latent = 16, 4
    dlgm = DLGM(784, hidden, latent, factor_recog=1, key=0)
    ckpt = str(tmp_path / "tiny_dlgm.msgpack")
    save_checkpoint(ckpt, (dlgm.gen_params, dlgm.rec_params))

    monkeypatch.setattr(
        sys, "argv",
        ["dlgm_evaluate", "--checkpoint", ckpt, "--particle-size", "4",
         "--batch-size", "32", "--n-batches", "1",
         "--hidden-dim", str(hidden), "--latent-dim", str(latent)],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dlgm_evaluate.main()
    out = buf.getvalue()
    assert "-ln p(v) =" in out, out
    nll = float(out.split("=")[1].split("nats")[0])
    # an untrained model on binarized digits: finite and clearly positive
    assert np.isfinite(nll) and nll > 100.0, nll
