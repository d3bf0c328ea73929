"""Linear classifier probe on latent representations.

Reference components: ``MNIST_LinearClassifier`` + ``train`` / ``test``
(``/root/reference/utils/training_evaluation.py:208-237``) and
``get_representations`` (``utils/model.py:71-163``) — the MAP / full-chain /
expectation posterior representations of the first PC layer.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.trainer import GenerativeModel, LangevinStep


class LinearClassifier:
    """rep_size -> 10 linear head trained with cross-entropy."""

    def __init__(self, rep_size: int, num_classes: int = 10, lr: float = 0.05, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        bound = 1.0 / (rep_size ** 0.5)
        kw, kb = jax.random.split(key)
        self.params = {
            "w": jax.random.uniform(kw, (rep_size, num_classes), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (num_classes,), jnp.float32, -bound, bound),
        }
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)

        @jax.jit
        def _step(params, opt_state, x, y):
            def loss_fn(p):
                logits = x @ p["w"] + p["b"]
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = _step

    def __call__(self, x):
        return x @ self.params["w"] + self.params["b"]

    def train_step(self, x, y):
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, x, y
        )
        return loss


def train_linear_classifier(
    reps: np.ndarray,
    labels: np.ndarray,
    epochs: int = 50,
    batch_size: int = 128,
    lr: float = 0.05,
    seed: int = 0,
) -> tp.Tuple[LinearClassifier, float]:
    """Train the probe; returns (classifier, best train accuracy) — the
    reference trains 50 epochs and reports the best epoch accuracy
    (DLGM.py:344-359, figure_2.py:202-216)."""
    clf = LinearClassifier(reps.shape[1], lr=lr, key=jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    n = len(reps)
    best = 0.0
    for _ in range(epochs):
        idx = rng.permutation(n)
        for s in range(0, n, batch_size):
            sel = idx[s : s + batch_size]
            clf.train_step(jnp.asarray(reps[sel]), jnp.asarray(labels[sel]))
        acc = test_classifier(clf, reps, labels, batch_size)
        best = max(best, acc)
    return clf, best


def test_classifier(clf, reps, labels, batch_size: int = 1000) -> float:
    """Accuracy of the probe (reference test, training_evaluation.py:217-227)."""
    correct = 0
    for s in range(0, len(reps), batch_size):
        logits = clf(jnp.asarray(reps[s : s + batch_size]))
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        correct += int((pred == np.asarray(labels[s : s + batch_size])).sum())
    return correct / len(reps)


def get_representations(
    gen: GenerativeModel,
    config: dict,
    trainers,
    batches,
    rep_type: str = "MAP",
    n: tp.Optional[int] = None,
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Posterior representations of the first PC layer
    (reference get_representations, utils/model.py:71-163).

    rep_type:
      * "MAP":          PC MAP inference; one representation per datum;
      * "full":         all post-burn-in Langevin samples (thinned to ``n``
                        per datum when given), labels repeated;
      * "expectation":  mean over the sampling window.
    Returns (representations [N, d], labels [N]).
    """
    reps_out, labels_out = [], []
    input_size = config["input_size"]

    if rep_type == "MAP":
        pc_trainer = trainers[0]
        for data, label in batches:
            pseudo = jnp.zeros((data.shape[0], input_size))
            pc_trainer.train_on_batch(
                pseudo,
                loss_fn=config["loss_fn"],
                loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
                is_return_results_every_t=False,
            )
            reps_out.append(np.asarray(gen.latents[0]))
            labels_out.append(np.asarray(label))
        return np.concatenate(reps_out), np.concatenate(labels_out)

    if rep_type not in ("full", "expectation") or len(trainers) != 2:
        raise NotImplementedError(rep_type)
    pc_trainer, mcpc_trainer = trainers
    # trajectory consumers can take the kernel fast path on TPU
    mcpc_trainer.use_pallas_capture = True

    mixing, sampling = config["mixing"], config["sampling"]
    stride = 1
    if rep_type == "full" and n is not None:
        stride = max(int(sampling / n), 1)

    for data, label in batches:
        pseudo = jnp.zeros((data.shape[0], input_size))
        pc_trainer.train_on_batch(
            pseudo,
            loss_fn=config["loss_fn"],
            loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
            is_return_results_every_t=False,
        )
        results = mcpc_trainer.train_on_batch(
            pseudo,
            loss_fn=config["loss_fn"],
            loss_fn_kwargs={"_target": data, "_var": config["input_var"]},
            callback_after_t=LangevinStep(var=2.0),
            is_sample_x_at_batch_start=False,
            is_return_representations=True,
            capture_stride=stride,
        )
        reps = np.asarray(results["representations"])  # [T/stride, B, d]
        # Post-burn-in window anchored at the mixing step: keep the LAST
        # sampling//stride captures — every selected t is >= mixing, and when
        # stride divides mixing and sampling this equals the reference's
        # temp[mixing::indent] exactly (utils/model.py:158).
        n_keep = max(sampling // stride, 1)
        post = reps[len(reps) - n_keep :]
        if rep_type == "expectation":
            reps_here = reps.mean(axis=0)
            labels_here = np.asarray(label)
        else:
            reps_here = post.reshape(-1, post.shape[-1])
            labels_here = np.tile(np.asarray(label), post.shape[0])
        reps_out.append(reps_here)
        labels_out.append(labels_here)
    return np.concatenate(reps_out), np.concatenate(labels_out)
