"""Shared model layers: sinusoidal positional encoding, MLP, drop-path.

PositionalEncoding reimplements the reference's vanilla batch-first sin/cos
table (reference src/models/model.py:320-340): pe[pos, 2i] = sin,
pe[pos, 2i+1] = cos, max_len 500, added to the input.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Static [max_len, d_model] sin/cos table (model.py:324-333 semantics)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * -(np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    d_model: int
    max_len: int = 500

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset: int | jnp.ndarray = 0) -> jnp.ndarray:
        pe = jnp.asarray(sinusoidal_position_encoding(self.max_len, self.d_model),
                         x.dtype)
        seq_len = x.shape[1]
        if isinstance(offset, (int, np.integer)) and offset == 0:
            pos = pe[:seq_len]
        else:
            pos = jax.lax.dynamic_slice_in_dim(pe, offset, seq_len, axis=0)
        return x + pos[None]


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """LayerNorm → Dense → GELU → drop → Dense → drop (TinyViT MLP)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x
