"""pytorch-fid-compatible InceptionV3 feature extractor (pure JAX).

The reference computes FID by shelling out to ``python -m pytorch_fid``
(``/root/reference/utils/training_evaluation.py:104-139``), whose metric
network is torchvision's InceptionV3 with pytorch-fid's FID-specific pooling
tweaks (FIDInceptionA/C/E: average pools exclude the zero padding from the
divisor; the last E block uses a max pool).  This module re-implements that
exact graph as a pure function over a params pytree laid out to MIRROR the
torch ``state_dict`` module names, so the official FID weights (or any
torchvision InceptionV3 checkpoint) drop straight in via
:func:`load_torch_state_dict`.

No weights ship in this environment (zero egress); without them the
architecture is still fully testable (shape + numerics parity of every
primitive against torch CPU, tests/test_inception.py) and the framework's
offline default remains the in-framework ResNet-9 / pixel features
(``eval/fid.py``).  Drop a torch state dict at
``$MCPC_INCEPTION_WEIGHTS`` (or pass ``weights=``) to activate
paper-comparable InceptionV3-pool3 FID.

Input pipeline parity (pytorch_fid/inception.py): images in [0, 1], RGB,
bilinearly resized to 299x299 (half-pixel centers, no antialias — torch
``F.interpolate(..., align_corners=False)``), then scaled to [-1, 1].
Output: the 2048-dim final-average-pool features.
"""

from __future__ import annotations

import functools
import os
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# primitives (NCHW / OIHW, matching torch semantics exactly)
# ---------------------------------------------------------------------------

_DN = ("NCHW", "OIHW", "NCHW")
_BN_EPS = 1e-3  # torchvision BasicConv2d: BatchNorm2d(eps=0.001)


def conv2d(x, w, stride=1, padding=(0, 0)):
    """torch F.conv2d (no bias): symmetric (ph, pw) zero padding.

    Full-f32 accumulation: this is METRIC math — the TPU's default bf16
    MXU passes would stack ~2^-8 relative error through ~90 conv layers
    feeding the Fréchet statistics (the same trap that zeroed the KL
    estimator's NN distances; see CLAUDE.md)."""
    ph, pw = padding if isinstance(padding, tuple) else (padding, padding)
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(ph, ph), (pw, pw)], dimension_numbers=_DN,
        precision=lax.Precision.HIGHEST,
    )


def batch_norm(x, p):
    """Eval-mode BatchNorm2d with running stats (torch semantics)."""
    inv = lax.rsqrt(p["bn_v"] + _BN_EPS)
    scale = (p["bn_w"] * inv)[None, :, None, None]
    shift = (p["bn_b"] - p["bn_m"] * p["bn_w"] * inv)[None, :, None, None]
    return x * scale + shift


def basic_conv(x, p, stride=1, padding=(0, 0)):
    """torchvision BasicConv2d: conv(bias-free) -> BN(eps=1e-3) -> relu."""
    return jax.nn.relu(batch_norm(conv2d(x, p["w"], stride, padding), p))


def max_pool(x, k=3, stride=2, padding=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)],
    )


def avg_pool_excl(x, k=3, stride=1, padding=1):
    """AvgPool2d(count_include_pad=False) — the pytorch-fid pooling fix
    (pytorch_fid/inception.py FIDInceptionA/C/E): each window divides by the
    number of REAL elements it covers, not k*k."""
    pads = [(0, 0), (0, 0), (padding, padding), (padding, padding)]
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 1, k, k), (1, 1, stride, stride), pads
    )
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, 1, k, k), (1, 1, stride, stride), pads
    )
    return summed / counts


def resize_bilinear(x, size):
    """torch F.interpolate(mode='bilinear', align_corners=False): half-pixel
    centers, no antialias — jax.image.resize('bilinear') matches."""
    n, c = x.shape[:2]
    return jax.image.resize(x, (n, c, size, size), method="bilinear")


# ---------------------------------------------------------------------------
# inception blocks (torchvision inception_v3 + pytorch-fid pooling variants)
# ---------------------------------------------------------------------------


def inception_a(x, p):
    b1 = basic_conv(x, p["branch1x1"])
    b5 = basic_conv(x, p["branch5x5_1"])
    b5 = basic_conv(b5, p["branch5x5_2"], padding=(2, 2))
    b3 = basic_conv(x, p["branch3x3dbl_1"])
    b3 = basic_conv(b3, p["branch3x3dbl_2"], padding=(1, 1))
    b3 = basic_conv(b3, p["branch3x3dbl_3"], padding=(1, 1))
    bp = basic_conv(avg_pool_excl(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def inception_b(x, p):
    b3 = basic_conv(x, p["branch3x3"], stride=2)
    bd = basic_conv(x, p["branch3x3dbl_1"])
    bd = basic_conv(bd, p["branch3x3dbl_2"], padding=(1, 1))
    bd = basic_conv(bd, p["branch3x3dbl_3"], stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def inception_c(x, p):
    b1 = basic_conv(x, p["branch1x1"])
    b7 = basic_conv(x, p["branch7x7_1"])
    b7 = basic_conv(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = basic_conv(b7, p["branch7x7_3"], padding=(3, 0))
    bd = basic_conv(x, p["branch7x7dbl_1"])
    bd = basic_conv(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = basic_conv(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = basic_conv(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = basic_conv(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = basic_conv(avg_pool_excl(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def inception_d(x, p):
    b3 = basic_conv(x, p["branch3x3_1"])
    b3 = basic_conv(b3, p["branch3x3_2"], stride=2)
    b7 = basic_conv(x, p["branch7x7x3_1"])
    b7 = basic_conv(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = basic_conv(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = basic_conv(b7, p["branch7x7x3_4"], stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def inception_e(x, p, pool: str):
    """pool='avg' -> FIDInceptionE_1 (Mixed_7b); pool='max' ->
    FIDInceptionE_2 (Mixed_7c, pytorch-fid uses a max pool here to match the
    original TF-FID graph)."""
    b1 = basic_conv(x, p["branch1x1"])
    b3 = basic_conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate(
        [
            basic_conv(b3, p["branch3x3_2a"], padding=(0, 1)),
            basic_conv(b3, p["branch3x3_2b"], padding=(1, 0)),
        ],
        axis=1,
    )
    bd = basic_conv(x, p["branch3x3dbl_1"])
    bd = basic_conv(bd, p["branch3x3dbl_2"], padding=(1, 1))
    bd = jnp.concatenate(
        [
            basic_conv(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
            basic_conv(bd, p["branch3x3dbl_3b"], padding=(1, 0)),
        ],
        axis=1,
    )
    if pool == "avg":
        bp = avg_pool_excl(x)
    else:
        bp = max_pool(x, k=3, stride=1, padding=1)
    bp = basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_pool3_features(params, x):
    """The full pytorch-fid forward to the 2048-dim pool3 features.

    ``x``: [N, 3, H, W] in [0, 1].  Resize + input normalization included
    (pytorch_fid/inception.py: resize_input=True, normalize_input=True).
    """
    x = resize_bilinear(x, 299)
    x = 2.0 * x - 1.0
    x = basic_conv(x, params["Conv2d_1a_3x3"], stride=2)
    x = basic_conv(x, params["Conv2d_2a_3x3"])
    x = basic_conv(x, params["Conv2d_2b_3x3"], padding=(1, 1))
    x = max_pool(x)
    x = basic_conv(x, params["Conv2d_3b_1x1"])
    x = basic_conv(x, params["Conv2d_4a_3x3"])
    x = max_pool(x)
    x = inception_a(x, params["Mixed_5b"])
    x = inception_a(x, params["Mixed_5c"])
    x = inception_a(x, params["Mixed_5d"])
    x = inception_b(x, params["Mixed_6a"])
    x = inception_c(x, params["Mixed_6b"])
    x = inception_c(x, params["Mixed_6c"])
    x = inception_c(x, params["Mixed_6d"])
    x = inception_c(x, params["Mixed_6e"])
    x = inception_d(x, params["Mixed_7a"])
    x = inception_e(x, params["Mixed_7b"], pool="avg")
    x = inception_e(x, params["Mixed_7c"], pool="max")
    return jnp.mean(x, axis=(2, 3))  # adaptive avg pool (1,1) -> [N, 2048]


# ---------------------------------------------------------------------------
# architecture spec: (module name, in_ch, out_ch, (kh, kw)) for every conv —
# drives both random init (tests) and state-dict import validation
# ---------------------------------------------------------------------------


def _a_spec(name, c_in, pool):
    return [
        (f"{name}.branch1x1", c_in, 64, (1, 1)),
        (f"{name}.branch5x5_1", c_in, 48, (1, 1)),
        (f"{name}.branch5x5_2", 48, 64, (5, 5)),
        (f"{name}.branch3x3dbl_1", c_in, 64, (1, 1)),
        (f"{name}.branch3x3dbl_2", 64, 96, (3, 3)),
        (f"{name}.branch3x3dbl_3", 96, 96, (3, 3)),
        (f"{name}.branch_pool", c_in, pool, (1, 1)),
    ]


def _b_spec(name, c_in):
    return [
        (f"{name}.branch3x3", c_in, 384, (3, 3)),
        (f"{name}.branch3x3dbl_1", c_in, 64, (1, 1)),
        (f"{name}.branch3x3dbl_2", 64, 96, (3, 3)),
        (f"{name}.branch3x3dbl_3", 96, 96, (3, 3)),
    ]


def _c_spec(name, c_in, c7):
    return [
        (f"{name}.branch1x1", c_in, 192, (1, 1)),
        (f"{name}.branch7x7_1", c_in, c7, (1, 1)),
        (f"{name}.branch7x7_2", c7, c7, (1, 7)),
        (f"{name}.branch7x7_3", c7, 192, (7, 1)),
        (f"{name}.branch7x7dbl_1", c_in, c7, (1, 1)),
        (f"{name}.branch7x7dbl_2", c7, c7, (7, 1)),
        (f"{name}.branch7x7dbl_3", c7, c7, (1, 7)),
        (f"{name}.branch7x7dbl_4", c7, c7, (7, 1)),
        (f"{name}.branch7x7dbl_5", c7, 192, (1, 7)),
        (f"{name}.branch_pool", c_in, 192, (1, 1)),
    ]


def _d_spec(name, c_in):
    return [
        (f"{name}.branch3x3_1", c_in, 192, (1, 1)),
        (f"{name}.branch3x3_2", 192, 320, (3, 3)),
        (f"{name}.branch7x7x3_1", c_in, 192, (1, 1)),
        (f"{name}.branch7x7x3_2", 192, 192, (1, 7)),
        (f"{name}.branch7x7x3_3", 192, 192, (7, 1)),
        (f"{name}.branch7x7x3_4", 192, 192, (3, 3)),
    ]


def _e_spec(name, c_in):
    return [
        (f"{name}.branch1x1", c_in, 320, (1, 1)),
        (f"{name}.branch3x3_1", c_in, 384, (1, 1)),
        (f"{name}.branch3x3_2a", 384, 384, (1, 3)),
        (f"{name}.branch3x3_2b", 384, 384, (3, 1)),
        (f"{name}.branch3x3dbl_1", c_in, 448, (1, 1)),
        (f"{name}.branch3x3dbl_2", 448, 384, (3, 3)),
        (f"{name}.branch3x3dbl_3a", 384, 384, (1, 3)),
        (f"{name}.branch3x3dbl_3b", 384, 384, (3, 1)),
        (f"{name}.branch_pool", c_in, 192, (1, 1)),
    ]


def conv_spec() -> tp.List[tp.Tuple[str, int, int, tp.Tuple[int, int]]]:
    """(module path, in, out, kernel) for all 94 convs, in forward order."""
    spec = [
        ("Conv2d_1a_3x3", 3, 32, (3, 3)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3)),
    ]
    spec += _a_spec("Mixed_5b", 192, 32)
    spec += _a_spec("Mixed_5c", 256, 64)
    spec += _a_spec("Mixed_5d", 288, 64)
    spec += _b_spec("Mixed_6a", 288)
    spec += _c_spec("Mixed_6b", 768, 128)
    spec += _c_spec("Mixed_6c", 768, 160)
    spec += _c_spec("Mixed_6d", 768, 160)
    spec += _c_spec("Mixed_6e", 768, 192)
    spec += _d_spec("Mixed_7a", 768)
    spec += _e_spec("Mixed_7b", 1280)
    spec += _e_spec("Mixed_7c", 2048)
    return spec


def _set_nested(params: dict, path: str, leaf: dict):
    parts = path.split(".")
    d = params
    for k in parts[:-1]:
        d = d.setdefault(k, {})
    d[parts[-1]] = leaf


def init_inception_params(key, dtype=jnp.float32) -> dict:
    """Random params with the exact production shapes — for architecture
    tests; real runs import torch weights via load_torch_state_dict."""
    params: dict = {}
    for path, c_in, c_out, k in conv_spec():
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (c_out, c_in) + k, dtype) * (
            1.0 / np.sqrt(c_in * k[0] * k[1])
        )
        _set_nested(
            params, path,
            {
                "w": w,
                "bn_w": jnp.ones((c_out,), dtype),
                "bn_b": jnp.zeros((c_out,), dtype),
                "bn_m": jnp.zeros((c_out,), dtype),
                "bn_v": jnp.ones((c_out,), dtype),
            },
        )
    return params


def load_torch_state_dict(state: tp.Union[str, dict]) -> dict:
    """Import a torchvision/pytorch-fid InceptionV3 ``state_dict`` (path to a
    ``torch.save`` file, or an in-memory dict of tensors/arrays).

    Keys follow torchvision: ``<module>.conv.weight`` and
    ``<module>.bn.{weight,bias,running_mean,running_var}``; the classifier
    (``fc.*``), aux head and ``num_batches_tracked`` entries are ignored.
    Shapes are validated against :func:`conv_spec`.
    """
    if isinstance(state, (str, os.PathLike)):
        import torch

        state = torch.load(state, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v), jnp.float32)

    params: dict = {}
    for path, c_in, c_out, k in conv_spec():
        try:
            leaf = {
                "w": arr(state[f"{path}.conv.weight"]),
                "bn_w": arr(state[f"{path}.bn.weight"]),
                "bn_b": arr(state[f"{path}.bn.bias"]),
                "bn_m": arr(state[f"{path}.bn.running_mean"]),
                "bn_v": arr(state[f"{path}.bn.running_var"]),
            }
        except KeyError as e:
            raise KeyError(
                f"InceptionV3 state dict is missing {e.args[0]!r} — expected "
                "torchvision inception_v3 / pytorch-fid key layout"
            ) from None
        if leaf["w"].shape != (c_out, c_in) + k:
            raise ValueError(
                f"{path}.conv.weight has shape {leaf['w'].shape}, expected "
                f"{(c_out, c_in) + k}"
            )
        _set_nested(params, path, leaf)
    return params


WEIGHTS_ENV = "MCPC_INCEPTION_WEIGHTS"


def make_inception_features(
    weights: tp.Union[str, dict, None] = None, batch_size: int = 64
):
    """FID feature extractor over [N, 28, 28] images in [0, 1] -> [N, 2048].

    ``weights``: path to / dict of a torch InceptionV3 state dict; defaults
    to ``$MCPC_INCEPTION_WEIGHTS``.  Raises FileNotFoundError when no
    weights are available (this offline environment cannot fetch them —
    callers fall back to the ResNet-9 / pixel extractors in eval/fid.py).
    """
    if weights is None:
        weights = os.environ.get(WEIGHTS_ENV)
    if weights is None:
        raise FileNotFoundError(
            "no InceptionV3 weights: set $MCPC_INCEPTION_WEIGHTS to a torch "
            "state-dict file (e.g. pytorch-fid's pt_inception weights) or "
            "pass weights=; offline runs use the ResNet-9/pixel extractors"
        )
    if isinstance(weights, (str, os.PathLike)) and not os.path.isfile(weights):
        raise FileNotFoundError(f"InceptionV3 weights not found: {weights}")
    params = load_torch_state_dict(weights)

    fwd = jax.jit(functools.partial(inception_pool3_features, params))

    def fn(images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, np.float32).reshape(-1, 1, 28, 28)
        x = np.repeat(x, 3, axis=1)  # grayscale -> RGB (PIL convert('RGB'))
        out = []
        for s in range(0, len(x), batch_size):
            out.append(np.asarray(fwd(jnp.asarray(x[s : s + batch_size]))))
        return np.concatenate(out, axis=0)

    fn.tag = "inception"
    return fn
