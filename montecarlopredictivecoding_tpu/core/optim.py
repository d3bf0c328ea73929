"""Optimizer adapters.

The reference passes ``torch.optim`` classes + kwargs into the trainer
(``utils/training_evaluation.py:16-70``).  Here optimizers are described by a
hashable ``OptimizerSpec`` mapped onto optax transforms with
torch-equivalent semantics (same update rule, bias correction, eps
placement), so reference configs carry over directly:

    OptimizerSpec("sgd", lr=0.1)
    OptimizerSpec("adam", lr=0.001, betas=(0.9, 0.999))

Dynamic x-learning-rate annealing (reference pc_trainer.py:881-901) is
implemented by scaling the produced update by a carried ``lr_scale`` factor —
identical to torch mutating ``param_groups['lr']`` because both SGD and Adam
updates are linear in the learning rate.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import optax


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    name: str  # 'sgd' | 'adam' | 'adamw'
    lr: float = 0.1
    momentum: float = 0.0
    betas: tp.Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0

    @staticmethod
    def from_torch_style(name_or_spec, kwargs: tp.Optional[dict] = None) -> "OptimizerSpec":
        """Build a spec from reference-style ``(optimizer_fn, kwargs)`` pairs.

        Accepts the strings 'sgd'/'adam'/'adamw', an OptimizerSpec (passed
        through), or a torch/optax optimizer class-like object whose
        ``__name__`` identifies it.
        """
        if isinstance(name_or_spec, OptimizerSpec):
            return name_or_spec
        kwargs = dict(kwargs or {})
        if isinstance(name_or_spec, str):
            name = name_or_spec.lower()
        else:
            name = getattr(name_or_spec, "__name__", str(name_or_spec)).lower()
        if name not in ("sgd", "adam", "adamw"):
            raise ValueError(f"unsupported optimizer {name!r}")
        spec = {"name": name}
        if "lr" in kwargs:
            spec["lr"] = float(kwargs["lr"])
        if "momentum" in kwargs:
            spec["momentum"] = float(kwargs["momentum"])
        if "betas" in kwargs:
            spec["betas"] = tuple(float(b) for b in kwargs["betas"])
        if "eps" in kwargs:
            spec["eps"] = float(kwargs["eps"])
        if "weight_decay" in kwargs:
            spec["weight_decay"] = float(kwargs["weight_decay"])
        return OptimizerSpec(**spec)

    def make(self) -> optax.GradientTransformation:
        if self.name == "sgd":
            tx = optax.sgd(
                learning_rate=self.lr,
                momentum=self.momentum if self.momentum else None,
            )
            if self.weight_decay:
                tx = optax.chain(
                    optax.add_decayed_weights(self.weight_decay), tx
                )
            return tx
        if self.name == "adam":
            tx = optax.adam(
                learning_rate=self.lr,
                b1=self.betas[0],
                b2=self.betas[1],
                eps=self.eps,
            )
            if self.weight_decay:
                # torch Adam's weight_decay adds wd*param to the gradient.
                tx = optax.chain(
                    optax.add_decayed_weights(self.weight_decay), tx
                )
            return tx
        if self.name == "adamw":
            return optax.adamw(
                learning_rate=self.lr,
                b1=self.betas[0],
                b2=self.betas[1],
                eps=self.eps,
                weight_decay=self.weight_decay,
            )
        raise ValueError(f"unsupported optimizer {self.name!r}")
