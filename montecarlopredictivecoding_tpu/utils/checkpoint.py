"""Checkpointing: native pytree checkpoints + torch state-dict import AND
export shims (interop both ways: the reference's 28 shipped checkpoints load
here, and models trained here load back into the reference code unchanged).

The reference persists models as ``torch.save(state_dict)`` files with keys
``"<module_idx>.weight" / ".bias"`` plus stale ``"<idx>._x"`` latents, always
loaded ``strict=False`` (e.g. ``/root/reference/figure_2.py:184``,
``table_1.py:76``; key layout verified in SURVEY.md §2.3 row 24).  The shim
maps those onto our params pytree (transposing torch's [out, in] weights to
the [in, out] layout our matmuls use) so the 28 shipped checkpoints can be
loaded for parity evaluation.

Native checkpoints are flax msgpack bytes (works for any params/latents/opt
pytree, no pickle).
"""

from __future__ import annotations

import os
import re
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import PCModel


def save_checkpoint(path: str, pytree) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, pytree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def load_checkpoint(path: str, like) -> tp.Any:
    """Load a checkpoint saved by :func:`save_checkpoint`; ``like`` is a
    pytree with the target structure (e.g. ``model.init(key)``)."""
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(like, data)


def torch_state_dict_to_params(
    state_dict: tp.Mapping[str, tp.Any],
    model: tp.Optional[PCModel] = None,
) -> tuple:
    """Convert a reference-style Sequential state dict to our params tuple.

    Keys ``"<i>.weight"`` are gathered in ascending module index; stale
    ``"<i>._x"`` latent entries are ignored (the reference loads with
    ``strict=False`` for the same reason).
    """
    weights: dict[int, np.ndarray] = {}
    biases: dict[int, np.ndarray] = {}
    for k, v in state_dict.items():
        m = re.fullmatch(r"(\d+)\.(weight|bias)", k)
        if not m:
            continue  # e.g. "1._x" stale latents
        idx = int(m.group(1))
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if m.group(2) == "weight":
            weights[idx] = arr
        else:
            biases[idx] = arr

    params = []
    for idx in sorted(weights):
        p = {"w": jnp.asarray(weights[idx].T)}  # torch [out,in] -> ours [in,out]
        if idx in biases:
            p["b"] = jnp.asarray(biases[idx])
        params.append(p)

    if model is not None:
        expected = [
            (model.modules[i].in_dim, model.modules[i].out_dim)
            for i in model.linear_indices
        ]
        got = [tuple(p["w"].shape) for p in params]
        if expected != got:
            raise ValueError(
                f"checkpoint shapes {got} do not match model Linears {expected}"
            )
    return tuple(params)


def load_torch_state_dict(path: str, model: tp.Optional[PCModel] = None) -> tuple:
    """Load a reference torch checkpoint file into a params tuple."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_params(sd, model)


def params_to_torch_state_dict(model: PCModel, params) -> dict:
    """Inverse of :func:`torch_state_dict_to_params` — EXPORT: emit the
    reference's Sequential key layout (``"<module_idx>.weight"/".bias"``,
    torch ``[out, in]`` weights) for a params tuple trained here.

    Our ``PCModel`` module lists mirror the reference Sequential
    module-for-module (``make_mlp_model`` == reference utils/model.py:47-69),
    so each Linear's position in ``model.modules`` IS its torch module index
    — checkpoints exported this way load into the reference code unchanged
    (its loads are ``strict=False``, so the absent stale ``"<i>._x"`` latent
    entries don't matter)."""
    import torch

    if len(model.linear_indices) != len(params):
        raise ValueError(
            f"params tuple has {len(params)} entries for "
            f"{len(model.linear_indices)} Linear modules"
        )
    sd = {}
    for idx, p in zip(model.linear_indices, params):
        sd[f"{idx}.weight"] = torch.from_numpy(
            np.asarray(p["w"]).T.copy()  # ours [in,out] -> torch [out,in]
        )
        if "b" in p:
            sd[f"{idx}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())
    return sd


def save_torch_state_dict(path: str, model: PCModel, params) -> None:
    """Write a reference-loadable torch checkpoint for our trained params."""
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(params_to_torch_state_dict(model, params), path)


def _t(v) -> jnp.ndarray:
    return jnp.asarray(np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v))


def torch_dlgm_state_dict_to_params(state_dict: tp.Mapping[str, tp.Any]):
    """Convert a reference DLGM checkpoint into our (gen_params, rec_params)
    pytrees for :class:`..models.dlgm.DLGM`.

    Accepts both layouts the reference produces:

    - the NESTED two-level dict the reference saves and loads
      (``{"generative_model": sd, "recognition_model": sd}``,
      evaluate.py:58-60) — flattened to dotted keys first;
    - flat dotted state dicts.

    And both topologies:

    - the SIMPLE GenerativeModel/RecognitionModel (generative.py:5-16,
      recognition.py:8-32 — fc3/fc4 + fc1/fc21/fc22; the topology of the
      shipped ``GenerativeModel_RecognitionModel_CholeskyFactor.pth``) —
      returned as ``({"fc3", "fc4"}, {"nets": [one net]})``, consumed by
      :func:`..models.dlgm.generative_forward`'s simple branch;
    - the stacked zoo (``T_list``/``final``/``node_list.N``,
      DLGM.py:216-228)."""
    # flatten the reference's nested save format to dotted keys
    if any(not hasattr(v, "shape") and isinstance(v, tp.Mapping)
           for v in state_dict.values()):
        flat = {}
        for top, sub in state_dict.items():
            if isinstance(sub, tp.Mapping):
                for k, v in sub.items():
                    flat[f"{top}.{k}"] = v
            else:
                flat[top] = sub
        state_dict = flat

    if "generative_model.fc3.weight" in state_dict:
        gen_s = {
            "fc3": {"w": _t(state_dict["generative_model.fc3.weight"]).T,
                    "b": _t(state_dict["generative_model.fc3.bias"])},
            "fc4": {"w": _t(state_dict["generative_model.fc4.weight"]).T,
                    "b": _t(state_dict["generative_model.fc4.bias"])},
        }
        rec_s = {
            "nets": [
                {
                    "fc1": {"w": _t(state_dict["recognition_model.fc1.weight"]).T,
                            "b": _t(state_dict["recognition_model.fc1.bias"])},
                    "mu": {"w": _t(state_dict["recognition_model.fc21.weight"]).T,
                           "b": _t(state_dict["recognition_model.fc21.bias"])},
                    "cov": {"w": _t(state_dict["recognition_model.fc22.weight"]).T,
                            "b": _t(state_dict["recognition_model.fc22.bias"])},
                }
            ]
        }
        return gen_s, rec_s

    gen: dict = {"bias": None, "T": [], "final": None}
    for k in sorted(state_dict):
        m = re.fullmatch(r"generative_model\.T_list\.(\d+)\.1\.weight", k)
        if m:
            i = int(m.group(1))
            while len(gen["T"]) <= i:
                gen["T"].append({})
            gen["T"][i]["w"] = _t(state_dict[k]).T
            gen["T"][i]["b"] = _t(state_dict[f"generative_model.T_list.{i}.1.bias"])
    if "generative_model.bias.bias" in state_dict:
        gen["bias"] = _t(state_dict["generative_model.bias.bias"])
    gen["final"] = {
        "w": _t(state_dict["generative_model.final.1.weight"]).T,
        "b": _t(state_dict["generative_model.final.1.bias"]),
    }
    if gen["bias"] is None:
        # first T block's input dim gives the top latent dim
        gen["bias"] = jnp.zeros((gen["T"][0]["w"].shape[0],))

    nets = []
    i = 0
    while f"recognition_model.node_list.{i}.fc1.weight" in state_dict:
        p = f"recognition_model.node_list.{i}"
        nets.append(
            {
                "fc1": {"w": _t(state_dict[p + ".fc1.weight"]).T,
                        "b": _t(state_dict[p + ".fc1.bias"])},
                "mu": {"w": _t(state_dict[p + ".fc21.weight"]).T,
                       "b": _t(state_dict[p + ".fc21.bias"])},
                "cov": {"w": _t(state_dict[p + ".fc22.weight"]).T,
                        "b": _t(state_dict[p + ".fc22.bias"])},
            }
        )
        i += 1
    return gen, {"nets": nets}


def load_torch_dlgm(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_dlgm_state_dict_to_params(sd)


# torch module path of each conv_block, in our ResNet9's call order
# (reference ResNet9.py:30-41 <-> models/resnet9.py ConvBlock_0..7)
_RESNET9_BLOCKS = (
    "conv1", "conv2", "res1.0", "res1.1", "conv3", "conv4", "res2.0", "res2.1"
)


def _resnet9_feats_hw(is_mask: bool) -> tp.Tuple[int, int]:
    """Spatial shape of the pre-flatten feature map on MNIST inputs.

    Full image 28x28: three 2x2 pools + the final MP halve 28 -> 14 -> 7 ->
    3 -> 1 in both dims.  Masked variant (bottom half, 14x28 and no pool in
    conv4): rows 14 -> 7 -> 3 -> 3 -> 1, cols 28 -> 14 -> 7 -> 7 -> 3 —
    hence the reference's 768-wide (256*1*3) head (ResNet9.py:41)."""
    return (1, 3) if is_mask else (1, 1)


def resnet9_from_torch_state_dict(
    state_dict: tp.Mapping[str, tp.Any], is_mask: bool = False
):
    """Convert a torch ResNet-9 state dict (the model reference figure-5
    users train and save, ResNet9.py:27-53) into our Flax variables
    ``(params, batch_stats)`` for ``models.resnet9.ResNet9``.

    Layout changes: conv kernels torch ``[out, in, kh, kw]`` -> flax
    ``[kh, kw, in, out]``; BN weight/bias -> scale/bias with running stats
    into ``batch_stats``; and the classifier's input ordering is permuted
    from torch's channel-major (NCHW) flatten to our NHWC flatten — an
    identity for the full-image head (1x1 spatial) but a real permutation
    for the 768-wide masked head."""

    def arr(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: dict = {}
    stats: dict = {}
    for i, blk in enumerate(_RESNET9_BLOCKS):
        name = f"ConvBlock_{i}"
        params[name] = {
            "Conv_0": {
                "kernel": jnp.asarray(arr(f"{blk}.0.weight").transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(arr(f"{blk}.0.bias")),
            },
            "BatchNorm_0": {
                "scale": jnp.asarray(arr(f"{blk}.1.weight")),
                "bias": jnp.asarray(arr(f"{blk}.1.bias")),
            },
        }
        stats[name] = {
            "BatchNorm_0": {
                "mean": jnp.asarray(arr(f"{blk}.1.running_mean")),
                "var": jnp.asarray(arr(f"{blk}.1.running_var")),
            }
        }
    h, w = _resnet9_feats_hw(is_mask)
    cw = arr("classifier.weight")  # [classes, C*h*w] in torch CHW order
    classes = cw.shape[0]
    kernel = (
        cw.reshape(classes, -1, h, w).transpose(0, 2, 3, 1).reshape(classes, -1).T
    )
    params["Dense_0"] = {
        "kernel": jnp.asarray(kernel),
        "bias": jnp.asarray(arr("classifier.bias")),
    }
    return params, stats


def resnet9_to_torch_state_dict(params, batch_stats, is_mask: bool = False) -> dict:
    """EXPORT our Flax ResNet-9 back to the reference's state-dict layout
    (strict-loadable into ResNet9.py:27-53, ``num_batches_tracked``
    included)."""
    import torch

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    sd: dict = {}
    for i, blk in enumerate(_RESNET9_BLOCKS):
        name = f"ConvBlock_{i}"
        conv, bn = params[name]["Conv_0"], params[name]["BatchNorm_0"]
        run = batch_stats[name]["BatchNorm_0"]
        sd[f"{blk}.0.weight"] = t(np.asarray(conv["kernel"]).transpose(3, 2, 0, 1))
        sd[f"{blk}.0.bias"] = t(conv["bias"])
        sd[f"{blk}.1.weight"] = t(bn["scale"])
        sd[f"{blk}.1.bias"] = t(bn["bias"])
        sd[f"{blk}.1.running_mean"] = t(run["mean"])
        sd[f"{blk}.1.running_var"] = t(run["var"])
        sd[f"{blk}.1.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
    h, w = _resnet9_feats_hw(is_mask)
    kernel = np.asarray(params["Dense_0"]["kernel"])  # [h*w*C, classes]
    classes = kernel.shape[1]
    sd["classifier.weight"] = t(
        kernel.T.reshape(classes, h, w, -1).transpose(0, 3, 1, 2).reshape(classes, -1)
    )
    sd["classifier.bias"] = t(params["Dense_0"]["bias"])
    return sd


def dlgm_params_to_torch_state_dict(gen_params, rec_params) -> dict:
    """EXPORT a simple-topology DLGM (one latent level, the
    GenerativeModel/RecognitionModel pair of generative.py:5-16 /
    recognition.py:8-32 — the only topology the reference's evaluate.py
    consumes) in the reference's nested save format
    (``{"generative_model": sd, "recognition_model": sd}``, evaluate.py:58-60),
    so a DLGM trained here runs through the reference evaluation unchanged."""
    import torch

    if "fc3" not in gen_params:
        raise ValueError(
            "torch export covers the simple one-level DLGM topology "
            "(gen_params with fc3/fc4); the stacked zoo has no torch "
            "consumer in the reference"
        )

    def w(a):
        return torch.from_numpy(np.asarray(a).T.copy())

    def b(a):
        return torch.from_numpy(np.asarray(a).copy())

    net = rec_params["nets"][0]
    return {
        "generative_model": {
            "fc3.weight": w(gen_params["fc3"]["w"]),
            "fc3.bias": b(gen_params["fc3"]["b"]),
            "fc4.weight": w(gen_params["fc4"]["w"]),
            "fc4.bias": b(gen_params["fc4"]["b"]),
        },
        "recognition_model": {
            "fc1.weight": w(net["fc1"]["w"]),
            "fc1.bias": b(net["fc1"]["b"]),
            "fc21.weight": w(net["mu"]["w"]),
            "fc21.bias": b(net["mu"]["b"]),
            "fc22.weight": w(net["cov"]["w"]),
            "fc22.bias": b(net["cov"]["b"]),
        },
    }
