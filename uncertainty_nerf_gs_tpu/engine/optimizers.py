"""Per-group optimizers with exponential-decay schedules.

Mirrors the reference's trainer optimizer layout (`/root/reference/
nerfuncertainty/models/laplace/laplace_config.py:40-53`): Adam(lr=1e-2,
eps=1e-15) decayed exponentially to 1e-4 over 200k steps for the
``proposal_networks`` and ``fields`` groups, Adam(1e-3 -> 1e-4 over 5k) for
``camera_opt`` — implemented as one `optax.multi_transform` over the param
pytree, so the whole update is a single fused XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerGroupConfig:
    lr: float = 1e-2
    eps: float = 1e-15
    lr_final: float = 1e-4
    max_steps: int = 200_000
    weight_decay: float = 0.0
    warmup_steps: int = 0


DEFAULT_GROUPS: dict[str, OptimizerGroupConfig] = {
    # warmup note: Adam(eps=1e-15) normalizes the near-zero early gradients
    # of the color path to full-lr steps — an unchecked random walk that can
    # saturate the rgb sigmoid (logits beyond +-70 observed) before density
    # forms, permanently killing color gradients. A short linear warmup lets
    # the density/proposal geometry form first; the reference's fused tcnn
    # MLPs don't exhibit the race (bias-free, different init scale).
    "proposal_networks": OptimizerGroupConfig(
        lr=1e-2, lr_final=1e-4, max_steps=200_000, warmup_steps=200
    ),
    "fields": OptimizerGroupConfig(
        lr=1e-2, lr_final=1e-4, max_steps=200_000, warmup_steps=200
    ),
    "camera_opt": OptimizerGroupConfig(lr=1e-3, lr_final=1e-4, max_steps=5_000),
}


def exp_decay_schedule(cfg: OptimizerGroupConfig) -> optax.Schedule:
    """lr(t) = lr * (lr_final/lr)^(t/max_steps), with optional linear warmup."""
    decay = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=cfg.max_steps,
        decay_rate=cfg.lr_final / cfg.lr,
        staircase=False,
        end_value=cfg.lr_final,
    )
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        return optax.join_schedules([warmup, decay], [cfg.warmup_steps])
    return decay


def _group_optimizer(cfg: OptimizerGroupConfig) -> optax.GradientTransformation:
    tx = optax.adamw(
        learning_rate=exp_decay_schedule(cfg),
        eps=cfg.eps,
        weight_decay=cfg.weight_decay,
    ) if cfg.weight_decay else optax.adam(
        learning_rate=exp_decay_schedule(cfg), eps=cfg.eps
    )
    return tx


def label_params(params: Any) -> Any:
    """Map each top-level param subtree to its optimizer group.

    ``proposal_*`` -> proposal_networks; ``camera_opt`` -> camera_opt;
    everything else (the field) -> fields.
    """

    def label_for(key: str) -> str:
        if key.startswith("proposal"):
            return "proposal_networks"
        if key == "camera_opt":
            return "camera_opt"
        return "fields"

    return {
        k: jax.tree.map(lambda _: label_for(k), v) for k, v in params.items()
    }


def make_optimizer(
    params: Any, groups: dict[str, OptimizerGroupConfig] | None = None
) -> optax.GradientTransformation:
    groups = dict(groups or DEFAULT_GROUPS)
    # ensure every label that appears has a group
    labels = label_params(params)
    used = set(jax.tree.leaves(labels))
    txs = {name: _group_optimizer(cfg) for name, cfg in groups.items() if name in used}
    for name in used:
        if name not in txs:
            txs[name] = _group_optimizer(OptimizerGroupConfig())
    return optax.multi_transform(txs, labels)
