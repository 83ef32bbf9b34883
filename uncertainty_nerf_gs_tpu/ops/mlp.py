"""Configurable MLP with skip connections and per-layer dropout.

TPU-native counterpart of the reference's ``create_mlp`` factory
(`/root/reference/nerfuncertainty/utils.py:6-43`) and nerfstudio's
``field_components.mlp.MLP``: hidden activations ReLU by default, optional
skip connections (input concatenated before the listed layer indices), and
dropout inserted before listed layer indices (``-1`` = before the final
linear) — the hook MC-dropout uses.

Widths default to 64, which tiles cleanly onto the MXU once points are
batched; computation is plain jittable matmuls so XLA fuses the chain.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """num_layers linear layers (num_layers-1 hidden activations)."""

    num_layers: int
    layer_width: int
    out_dim: int
    skip_connections: Sequence[int] = ()
    activation: Callable = nn.relu
    out_activation: Callable | None = None
    dropout_layers: Sequence[int] = ()
    dropout_rate: float = 0.0
    # bf16 hidden compute = the reference's AMP (`mixed_precision=True`
    # configs, autocast at `mcdropout_models.py:91`); params stay f32 and
    # the output is cast back to f32 for the heads/compositing.
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        in_dtype = x.dtype
        inp = x
        skips = set(self.skip_connections)
        # normalize dropout indices: -1 means before the final layer
        drops = {
            (self.num_layers - 1 if d == -1 else d) for d in self.dropout_layers
        }
        h = x
        for i in range(self.num_layers):
            if i in skips and i > 0:
                h = jnp.concatenate([h, inp], axis=-1)
            if i in drops and self.dropout_rate > 0.0:
                h = nn.Dropout(rate=self.dropout_rate)(
                    h, deterministic=deterministic
                )
            is_last = i == self.num_layers - 1
            width = self.out_dim if is_last else self.layer_width
            h = nn.Dense(width, name=f"dense_{i}", dtype=self.compute_dtype)(h)
            if not is_last:
                h = self.activation(h)
        h = h.astype(in_dtype)
        if self.out_activation is not None:
            h = self.out_activation(h)
        return h
