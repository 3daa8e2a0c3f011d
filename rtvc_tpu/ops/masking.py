"""Mask construction (reference src/utils/masking.py:4-26, in jnp).

These exist as standalone functions for API parity and tests; inside the
models the masks are folded directly into the attention kernel as additive
biases so XLA/Pallas can fuse them (no [L, L] bool materialization on the
hot path).
"""

from __future__ import annotations

import jax.numpy as jnp


def create_padding_mask(seq: jnp.ndarray, padding_token: int = 0) -> jnp.ndarray:
    """True where ``seq`` holds padding (reference masking.py:4-15)."""
    return seq == padding_token


def create_causal_mask(size: int) -> jnp.ndarray:
    """Upper-triangular (strict) bool mask; True = disallowed attention
    (reference masking.py:17-26, including its 'casual' spelling alias)."""
    row = jnp.arange(size)[:, None]
    col = jnp.arange(size)[None, :]
    return col > row


# Reference spelling preserved for drop-in compatibility.
create_casual_mask = create_causal_mask
