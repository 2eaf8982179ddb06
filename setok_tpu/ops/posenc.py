"""Fixed 2-D sin-cos positional encodings as pure functions.

Parity: /root/reference/src/model/setok/module.py:105-146
(`PositionalEncoding2D`) and setok/utils.py:5-10 (`get_emb`). The reference
caches the encoding in a module buffer keyed by input shape; under jit the
encoding is a compile-time constant, so a pure function is both simpler and
free at runtime (XLA constant-folds it).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _interleave_sin_cos(x: np.ndarray) -> np.ndarray:
    """stack(sin, cos) on the last axis and flatten — get_emb (utils.py:5-10)."""
    emb = np.stack([np.sin(x), np.cos(x)], axis=-1)
    return emb.reshape(*x.shape[:-1], -1)


def posenc_2d(h: int, w: int, channels: int, dtype=jnp.float32) -> jnp.ndarray:
    """2-D sin-cos positional encoding of shape (h, w, channels).

    Matches PositionalEncoding2D.forward (module.py:118-146): the first
    `ch = 2*ceil(channels/4)` channels encode the x (row) axis, the next `ch`
    encode the y (column) axis, and the result is truncated to `channels`.
    Computed in numpy at trace time — it is a constant.
    """
    ch = int(np.ceil(channels / 4) * 2)
    # the reference stores inv_freq as a float32 buffer (module.py:114-115);
    # round through float32 so float64 parity runs match it bit-for-bit
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float64) / ch))
    inv_freq = inv_freq.astype(np.float32).astype(np.float64)
    pos_x = np.arange(h, dtype=np.float64)
    pos_y = np.arange(w, dtype=np.float64)
    sin_x = np.einsum("i,j->ij", pos_x, inv_freq)   # (h, ch/2)
    sin_y = np.einsum("i,j->ij", pos_y, inv_freq)   # (w, ch/2)
    emb_x = _interleave_sin_cos(sin_x)              # (h, ch)
    emb_y = _interleave_sin_cos(sin_y)              # (w, ch)
    emb = np.zeros((h, w, 2 * ch), dtype=np.float64)
    emb[:, :, :ch] = emb_x[:, None, :]
    emb[:, :, ch:2 * ch] = emb_y[None, :, :]
    return jnp.asarray(emb[:, :, :channels], dtype=dtype)


def posenc_2d_flat(h: int, w: int, channels: int, dtype=jnp.float32) -> jnp.ndarray:
    """Same encoding flattened to (h*w, channels) — the layout the tokenizer
    adds to the (N, C) patch-feature sequence (tokenizer.py:164-168)."""
    return posenc_2d(h, w, channels, dtype=dtype).reshape(h * w, channels)
