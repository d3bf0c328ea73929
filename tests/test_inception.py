"""InceptionV3 FID feature graph: numerics parity of every primitive (and a
full inception block) against torch CPU, full-graph shape check, and the
torch state-dict import mapping.

The reference metric is pytorch-fid's InceptionV3-pool3 FID
(/root/reference/utils/training_evaluation.py:104-139); real weights cannot
be fetched offline, so these tests pin the ARCHITECTURE + import shim — the
numerics become paper-comparable the moment a weights file is provided via
$MCPC_INCEPTION_WEIGHTS.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from montecarlopredictivecoding_tpu.eval import inception as inc  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 5, 13, 11), dtype=np.float32)
    w = rng.standard_normal((7, 5, 3, 3), dtype=np.float32)
    for stride, pad in [(1, (0, 0)), (2, (0, 0)), (1, (1, 1)), (1, (0, 3))]:
        ours = np.asarray(inc.conv2d(jnp.asarray(x), jnp.asarray(w), stride, pad))
        ref = F.conv2d(_t(x), _t(w), stride=stride, padding=pad).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_batch_norm_matches_torch(rng):
    x = rng.standard_normal((2, 6, 9, 9), dtype=np.float32)
    p = {
        "bn_w": jnp.asarray(rng.standard_normal(6, dtype=np.float32)),
        "bn_b": jnp.asarray(rng.standard_normal(6, dtype=np.float32)),
        "bn_m": jnp.asarray(rng.standard_normal(6, dtype=np.float32)),
        "bn_v": jnp.asarray(rng.random(6, dtype=np.float32) + 0.1),
    }
    ours = np.asarray(inc.batch_norm(jnp.asarray(x), p))
    ref = F.batch_norm(
        _t(x), _t(p["bn_m"]), _t(p["bn_v"]), _t(p["bn_w"]), _t(p["bn_b"]),
        training=False, eps=1e-3,
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 4, 15, 15), dtype=np.float32)
    ours = np.asarray(inc.max_pool(jnp.asarray(x)))
    ref = F.max_pool2d(_t(x), 3, stride=2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    ours = np.asarray(inc.max_pool(jnp.asarray(x), k=3, stride=1, padding=1))
    ref = F.max_pool2d(_t(x), 3, stride=1, padding=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_avg_pool_count_include_pad_false_matches_torch(rng):
    """The pytorch-fid pooling fix: border windows divide by the REAL element
    count (count_include_pad=False)."""
    x = rng.standard_normal((2, 4, 15, 15), dtype=np.float32)
    ours = np.asarray(inc.avg_pool_excl(jnp.asarray(x)))
    ref = F.avg_pool2d(
        _t(x), 3, stride=1, padding=1, count_include_pad=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # and it genuinely differs from the include_pad variant at the border
    ref_incl = F.avg_pool2d(_t(x), 3, stride=1, padding=1).numpy()
    assert not np.allclose(ours, ref_incl)


def test_resize_bilinear_matches_torch(rng):
    x = rng.random((2, 3, 28, 28), dtype=np.float32)
    ours = np.asarray(inc.resize_bilinear(jnp.asarray(x), 299))
    ref = F.interpolate(
        _t(x), size=(299, 299), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


class _TorchBasicConv(torch.nn.Module):
    def __init__(self, c_in, c_out, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(c_in, c_out, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(c_out, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _TorchFIDInceptionA(torch.nn.Module):
    """pytorch-fid FIDInceptionA (torchvision InceptionA + excl-pad pool)."""

    def __init__(self, c_in, pool_features):
        super().__init__()
        self.branch1x1 = _TorchBasicConv(c_in, 64, kernel_size=1)
        self.branch5x5_1 = _TorchBasicConv(c_in, 48, kernel_size=1)
        self.branch5x5_2 = _TorchBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TorchBasicConv(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TorchBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TorchBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _TorchBasicConv(c_in, pool_features, kernel_size=1)

    def forward(self, x):
        bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        return torch.cat(
            [
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(bp),
            ],
            1,
        )


def _import_branch(mod: _TorchBasicConv) -> dict:
    sd = mod.state_dict()
    return {
        "w": jnp.asarray(sd["conv.weight"].numpy()),
        "bn_w": jnp.asarray(sd["bn.weight"].numpy()),
        "bn_b": jnp.asarray(sd["bn.bias"].numpy()),
        "bn_m": jnp.asarray(sd["bn.running_mean"].numpy()),
        "bn_v": jnp.asarray(sd["bn.running_var"].numpy()),
    }


def test_inception_a_block_matches_torch(rng):
    """Full FIDInceptionA block (random weights, randomized running stats):
    jax forward == torch forward."""
    torch.manual_seed(0)
    block = _TorchFIDInceptionA(192, 32).eval()
    # randomize running stats so BN import is actually exercised
    with torch.no_grad():
        for m in block.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    p = {name: _import_branch(getattr(block, name)) for name in (
        "branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
        "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool",
    )}
    x = rng.standard_normal((2, 192, 17, 17), dtype=np.float32)
    with torch.no_grad():
        ref = block(_t(x)).numpy()
    ours = np.asarray(inc.inception_a(jnp.asarray(x), p))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_full_graph_shapes_and_finite():
    """Architecture sanity at production shapes: 28x28 grayscale -> resize
    299 -> 2048-dim pool3 features, all finite."""
    params = inc.init_inception_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 299, 299))
    # skip the resize stage (already 299): call blocks directly via the
    # public forward on a 28x28 input instead
    feats = inc.inception_pool3_features(params, x[:, :, :28, :28])
    assert feats.shape == (1, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_state_dict_import_roundtrip():
    """Torch-style key mapping: export random params to a flat torch-layout
    dict, re-import, and get the identical pytree (plus shape validation and
    the missing-key error)."""
    params = inc.init_inception_params(jax.random.PRNGKey(2))
    flat = {}
    for path, *_ in inc.conv_spec():
        d = params
        for k in path.split("."):
            d = d[k]
        flat[f"{path}.conv.weight"] = np.asarray(d["w"])
        flat[f"{path}.bn.weight"] = np.asarray(d["bn_w"])
        flat[f"{path}.bn.bias"] = np.asarray(d["bn_b"])
        flat[f"{path}.bn.running_mean"] = np.asarray(d["bn_m"])
        flat[f"{path}.bn.running_var"] = np.asarray(d["bn_v"])
    flat["fc.weight"] = np.zeros((1008, 2048), np.float32)  # ignored
    imported = inc.load_torch_state_dict(flat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, imported,
    )
    bad = dict(flat)
    del bad["Mixed_7c.branch_pool.bn.running_var"]
    with pytest.raises(KeyError, match="Mixed_7c.branch_pool"):
        inc.load_torch_state_dict(bad)


def test_make_inception_features_requires_weights(monkeypatch):
    monkeypatch.delenv(inc.WEIGHTS_ENV, raising=False)
    with pytest.raises(FileNotFoundError, match="MCPC_INCEPTION_WEIGHTS"):
        inc.make_inception_features()


def test_make_inception_features_end_to_end(tmp_path):
    """Weights provided as an in-memory state dict: 28x28 [0,1] images ->
    [N, 2048] features through the jitted forward."""
    params = inc.init_inception_params(jax.random.PRNGKey(3))
    flat = {}
    for path, *_ in inc.conv_spec():
        d = params
        for k in path.split("."):
            d = d[k]
        flat[f"{path}.conv.weight"] = np.asarray(d["w"])
        flat[f"{path}.bn.weight"] = np.asarray(d["bn_w"])
        flat[f"{path}.bn.bias"] = np.asarray(d["bn_b"])
        flat[f"{path}.bn.running_mean"] = np.asarray(d["bn_m"])
        flat[f"{path}.bn.running_var"] = np.asarray(d["bn_v"])
    fn = inc.make_inception_features(weights=flat, batch_size=2)
    assert fn.tag == "inception"
    imgs = np.random.default_rng(1).random((3, 28, 28), dtype=np.float32)
    feats = fn(imgs)
    assert feats.shape == (3, 2048)
    assert np.all(np.isfinite(feats))


def test_conv_spec_complete():
    """Pin the graph against torchvision inception_v3: 94 BasicConv2d
    modules across the stem and all 11 mixed blocks — in particular all
    FOUR InceptionC blocks (Mixed_6b..6e; a missing 6e keeps every shape
    valid and imports silently, but the features stop being
    pytorch-fid-comparable)."""
    spec = inc.conv_spec()
    assert len(spec) == 94
    blocks = {path.split(".")[0] for path, *_ in spec}
    assert blocks == {
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
        "Conv2d_4a_3x3", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
        "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a",
        "Mixed_7b", "Mixed_7c",
    }
    # the InceptionC channel ladder (torchvision: 128, 160, 160, 192)
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                     ("Mixed_6d", 160), ("Mixed_6e", 192)):
        row = [r for r in spec if r[0] == f"{name}.branch7x7_1"]
        assert row and row[0][2] == c7, (name, row)


# ---- full-graph oracle: the pytorch-fid InceptionV3 variant built in torch,
# ---- weights imported through the real state_dict path ----------------------


class _TorchInceptionB(torch.nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3 = _TorchBasicConv(c_in, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _TorchBasicConv(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TorchBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TorchBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2),
            ],
            1,
        )


class _TorchFIDInceptionC(torch.nn.Module):
    def __init__(self, c_in, c7):
        super().__init__()
        self.branch1x1 = _TorchBasicConv(c_in, 192, kernel_size=1)
        self.branch7x7_1 = _TorchBasicConv(c_in, c7, kernel_size=1)
        self.branch7x7_2 = _TorchBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _TorchBasicConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _TorchBasicConv(c_in, c7, kernel_size=1)
        self.branch7x7dbl_2 = _TorchBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _TorchBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _TorchBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _TorchBasicConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _TorchBasicConv(c_in, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = self.branch_pool(
            F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        )
        return torch.cat([self.branch1x1(x), b7, bd, bp], 1)


class _TorchInceptionD(torch.nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3_1 = _TorchBasicConv(c_in, 192, kernel_size=1)
        self.branch3x3_2 = _TorchBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _TorchBasicConv(c_in, 192, kernel_size=1)
        self.branch7x7x3_2 = _TorchBasicConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _TorchBasicConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _TorchBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class _TorchFIDInceptionE(torch.nn.Module):
    def __init__(self, c_in, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = _TorchBasicConv(c_in, 320, kernel_size=1)
        self.branch3x3_1 = _TorchBasicConv(c_in, 384, kernel_size=1)
        self.branch3x3_2a = _TorchBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _TorchBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _TorchBasicConv(c_in, 448, kernel_size=1)
        self.branch3x3dbl_2 = _TorchBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _TorchBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _TorchBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _TorchBasicConv(c_in, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "avg":
            bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        else:
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class _TorchFIDInception(torch.nn.Module):
    """The pytorch-fid InceptionV3 feature graph, module names matching
    torchvision so state_dict() has the official key layout."""

    def __init__(self):
        super().__init__()
        B = _TorchBasicConv
        self.Conv2d_1a_3x3 = B(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = B(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = B(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = B(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = B(80, 192, kernel_size=3)
        self.Mixed_5b = _TorchFIDInceptionA(192, 32)
        self.Mixed_5c = _TorchFIDInceptionA(256, 64)
        self.Mixed_5d = _TorchFIDInceptionA(288, 64)
        self.Mixed_6a = _TorchInceptionB(288)
        self.Mixed_6b = _TorchFIDInceptionC(768, 128)
        self.Mixed_6c = _TorchFIDInceptionC(768, 160)
        self.Mixed_6d = _TorchFIDInceptionC(768, 160)
        self.Mixed_6e = _TorchFIDInceptionC(768, 192)
        self.Mixed_7a = _TorchInceptionD(768)
        self.Mixed_7b = _TorchFIDInceptionE(1280, pool="avg")
        self.Mixed_7c = _TorchFIDInceptionE(2048, pool="max")

    def forward(self, x):  # x in [0, 1], [N, 3, 299, 299]
        x = 2.0 * x - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)


def test_full_graph_matches_torch_oracle():
    """End-to-end: random-weight torch FID-Inception vs the jax graph with
    weights imported through load_torch_state_dict from the REAL torch
    state_dict — catches any missing/reordered block (this is the test
    shape that would have caught the Mixed_6e omission) and validates the
    import shim against genuine torch key layout (incl. ignoring
    num_batches_tracked)."""
    torch.manual_seed(7)
    model = _TorchFIDInception().eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    params = inc.load_torch_state_dict(model.state_dict())
    x = np.random.default_rng(3).random((1, 3, 299, 299), dtype=np.float32)
    with torch.no_grad():
        ref = model(_t(x)).numpy()
    # public path includes the 299->299 resize (identity at same size)
    ours = np.asarray(inc.inception_pool3_features(params, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 2048)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)
