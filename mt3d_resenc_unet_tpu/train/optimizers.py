"""Config-driven optimizer factory.

Optax counterpart of the reference's 13-optimizer factory
(reference: training/optimizers/optimizer.py:5-76 — dead code there, a live
extension point here). The trainer's default path uses
``train.step.build_optimizer`` (AdamW / SGD-nesterov, reference
train.py:69-84); this factory covers the wider set for users who override
``_get_optimizer``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import optax

Schedule = Union[float, optax.Schedule]


def create_optimizer(name: str, learning_rate: Schedule,
                     weight_decay: float = 0.0,
                     grad_clip_norm: Optional[float] = None,
                     **kwargs: Any) -> optax.GradientTransformation:
    """Build an optax optimizer by name with optional global-norm clipping."""
    n = name.lower()
    builders = {
        "adam": lambda: optax.adam(learning_rate, **kwargs),
        "adamw": lambda: optax.adamw(learning_rate,
                                     weight_decay=weight_decay, **kwargs),
        "adamax": lambda: optax.adamax(learning_rate, **kwargs),
        "sgd": lambda: optax.sgd(learning_rate,
                                 momentum=kwargs.pop("momentum", 0.9),
                                 nesterov=kwargs.pop("nesterov", True)),
        "rmsprop": lambda: optax.rmsprop(learning_rate, **kwargs),
        "adagrad": lambda: optax.adagrad(learning_rate, **kwargs),
        "adafactor": lambda: optax.adafactor(learning_rate, **kwargs),
        "lamb": lambda: optax.lamb(learning_rate,
                                   weight_decay=weight_decay, **kwargs),
        "lars": lambda: optax.lars(learning_rate,
                                   weight_decay=weight_decay, **kwargs),
        "lion": lambda: optax.lion(learning_rate,
                                   weight_decay=weight_decay, **kwargs),
        "novograd": lambda: optax.novograd(learning_rate,
                                           weight_decay=weight_decay,
                                           **kwargs),
        "nadam": lambda: optax.nadam(learning_rate, **kwargs),
        "radam": lambda: optax.radam(learning_rate, **kwargs),
        "fromage": lambda: optax.fromage(learning_rate),
        "yogi": lambda: optax.yogi(learning_rate, **kwargs),
        "sm3": lambda: optax.sm3(learning_rate, **kwargs),
    }
    if n not in builders:
        raise ValueError(f"Unknown optimizer '{name}'. "
                         f"Known: {sorted(builders)}")
    opt = builders[n]()
    if n in ("adam", "adamax", "rmsprop", "adagrad", "nadam", "radam",
             "yogi", "sm3", "sgd", "fromage") and weight_decay:
        opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    if grad_clip_norm:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    return opt
