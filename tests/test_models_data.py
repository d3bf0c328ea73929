"""Tests for the data pipeline, factories, and ResNet-9."""

import jax
import jax.numpy as jnp
import numpy as np

import montecarlopredictivecoding_tpu as mcpc
from montecarlopredictivecoding_tpu.data import (
    Batches,
    chunk_dataset,
    get_mnist_data,
    grating_dataset,
    noise_dataset,
)
from montecarlopredictivecoding_tpu.models import (
    get_mcpc_trainer,
    get_mcpc_trainer_one_sample,
    get_model,
    get_pc_trainer,
)


def _config(loss_fn):
    return {
        "input_size": 4,
        "hidden_size": 8,
        "hidden2_size": 8,
        "output_size": 784,
        "activation_fn": "relu",
        "loss_fn": loss_fn,
        "input_var": 0.3,
        "batch_size_train": 32,
        "batch_size_val": 64,
        "batch_size_test": 64,
        "T_pc": 5,
        "optimizer_x_fn_pc": "adam",
        "optimizer_x_kwargs_pc": {"lr": 0.1},
        "optimizer_p_fn": "adam",
        "optimizer_p_kwargs": {"lr": 0.001},
        "mixing": 3,
        "sampling": 4,
        "K": 5,
        "optimizer_x_kwargs_mcpc": {"lr": 0.01},
        "optimizer_p_fn_mcpc": "adam",
        "optimizer_p_kwargs_mcpc": {"lr": 0.01},
    }


def test_mnist_split_and_preprocessing():
    cfg_b = _config(mcpc.bernoulli_fn)
    train, val, test = get_mnist_data(cfg_b)
    assert train.dataset_size == 60000
    assert val.dataset_size == 6000
    assert test.dataset_size == 4000
    imgs, labels = next(iter(val))
    assert imgs.shape == (64, 784)
    vals = set(np.unique(np.asarray(imgs)))
    assert vals.issubset({0.0, 1.0})  # binarized

    cfg_g = _config(mcpc.fe_fn)
    train_g, _, _ = get_mnist_data(cfg_g)
    imgs_g, _ = next(iter(train_g))
    assert float(imgs_g.min()) >= -1.0 and float(imgs_g.max()) <= 1.0
    assert float(imgs_g.min()) < -0.5  # actually normalized to [-1, 1]


def test_batches_iterator():
    x = np.arange(10, dtype=np.float32)[:, None]
    y = np.arange(10)
    b = Batches(x, y, batch_size=4, shuffle=False)
    batches = list(b)
    assert len(batches) == 3 and batches[-1][0].shape[0] == 2
    b2 = Batches(x, y, batch_size=4, shuffle=False, drop_last=True)
    assert len(list(b2)) == 2


def test_synthetic_datasets():
    g = grating_dataset(5, size=28)
    assert g.shape == (5, 784) and g.min() >= 0.0 and g.max() <= 1.0
    n = noise_dataset(7)
    assert n.shape == (7, 784)
    assert np.all(n[0] == n[6])  # fixed image repeated
    chunks = chunk_dataset(np.arange(10), 4)
    assert [len(c) for c in chunks] == [4, 4, 2]


def test_factories_end_to_end():
    cfg = _config(mcpc.bernoulli_fn)
    gen = get_model(cfg, key=0)
    assert gen.model.num_pc_layers == 3
    pc_warm = get_pc_trainer(gen, cfg, is_mcpc=True)
    mc = get_mcpc_trainer(gen, cfg)
    one = get_mcpc_trainer_one_sample(gen, cfg)

    B = 8
    pseudo = jnp.zeros((B, cfg["input_size"]))
    data = (jax.random.uniform(jax.random.PRNGKey(0), (B, 784)) > 0.5).astype(
        jnp.float32
    )
    pc_warm.train_on_batch(
        pseudo, loss_fn=cfg["loss_fn"], loss_fn_kwargs={"_target": data}
    )
    w_before = np.asarray(gen.params[3]["w"]).copy()
    mc.train_on_batch(
        pseudo,
        loss_fn=cfg["loss_fn"],
        loss_fn_kwargs={"_target": data},
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False,
    )
    assert not np.allclose(w_before, np.asarray(gen.params[3]["w"]))
    # one-sample variant also updates weights
    w_before = np.asarray(gen.params[3]["w"]).copy()
    one.train_on_batch(
        pseudo,
        loss_fn=cfg["loss_fn"],
        loss_fn_kwargs={"_target": data},
        callback_after_t=mcpc.LangevinStep(var=2.0),
        is_sample_x_at_batch_start=False,
    )
    assert not np.allclose(w_before, np.asarray(gen.params[3]["w"]))


def test_resnet9_shapes_and_training():
    from montecarlopredictivecoding_tpu.models.resnet9 import (
        init_resnet9,
        make_eval_fn,
        make_feature_fn,
        make_train_step,
    )

    key = jax.random.PRNGKey(0)
    model, tx, state = init_resnet9(key)
    logits_fn = make_eval_fn(model)
    x = jax.random.normal(key, (4, 28, 28, 1))
    logits = logits_fn(state, x)
    assert logits.shape == (4, 10)
    feats = make_feature_fn(model)(state, x)
    assert feats.shape == (4, 256)

    # one train step reduces loss on a fixed batch
    step = make_train_step(model, tx)
    y = jnp.array([0, 1, 2, 3])
    state, loss0, _ = step(state, x, y)
    for _ in range(5):
        state, loss, _ = step(state, x, y)
    assert float(loss) < float(loss0)


def test_resnet9_masked_variant():
    from montecarlopredictivecoding_tpu.models.resnet9 import init_resnet9, make_eval_fn

    key = jax.random.PRNGKey(0)
    model, tx, state = init_resnet9(key, is_mask=True, input_hw=(14, 28))
    logits = make_eval_fn(model)(state, jnp.zeros((2, 14, 28, 1)))
    assert logits.shape == (2, 10)


def test_resnet9_masked_training_end_to_end():
    """Regression: train_resnet9(is_mask=True) used to init the Dense head
    on the FULL 28x28 shape (2304 wide) and crash on the first 14x28
    bottom-half batch (768 wide) — init_resnet9's default input_hw now
    follows the variant."""
    from montecarlopredictivecoding_tpu.models.resnet9 import train_resnet9

    rng = np.random.default_rng(0)
    batch = (rng.random((8, 784)).astype(np.float32),
             np.arange(8, dtype=np.int32) % 10)
    _, state = train_resnet9([batch], epochs=1, is_mask=True)
    assert state.params["Dense_0"]["kernel"].shape == (768, 10)
