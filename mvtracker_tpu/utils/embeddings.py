"""Sin/cos positional and flow embeddings (L0).

Numerics match the reference embedding layer
(`mvtracker/models/core/embeddings.py` in the reference repo) exactly, but
are implemented as pure jittable JAX with no host round-trips (the reference
computes sincos embeddings in numpy on the host; here everything is traced so
XLA fuses it into surrounding computation).

Two distinct frequency conventions exist in the reference and both are kept:
- `sincos_1d` family: omega_i = 1 / 10000^(2i/D), output [sin | cos]
  concatenated blockwise (reference `embeddings.py:92-110`);
- `coord_embedding` family ("get_Nd_embedding"): div_term_i = 2i * 1000 / C,
  output interleaved sin/cos per channel (reference `embeddings.py:113-200`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sincos_1d(embed_dim: int, pos: jax.Array) -> jax.Array:
    """1D sin/cos embedding; mirrors `get_1d_sincos_pos_embed_from_grid`
    (reference `embeddings.py:92-110`).

    Args:
        embed_dim: output dim, must be even.
        pos: any shape; flattened to [M].

    Returns: [M, embed_dim] = [sin(pos*omega) | cos(pos*omega)].
    """
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    omega = omega / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1).astype(omega.dtype)
    out = jnp.einsum("m,d->md", pos, omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_xy: jax.Array) -> jax.Array:
    """2D sincos embedding of [..., 2] coords; each axis gets D/2 dims."""
    assert embed_dim % 2 == 0
    shape = grid_xy.shape[:-1]
    emb_x = sincos_1d(embed_dim // 2, grid_xy[..., 0])
    emb_y = sincos_1d(embed_dim // 2, grid_xy[..., 1])
    return jnp.concatenate([emb_x, emb_y], axis=-1).reshape(*shape, embed_dim)


def sincos_3d(embed_dim: int, grid_xyz: jax.Array) -> jax.Array:
    """3D sincos embedding of [..., 3] coords; each axis gets D/3 dims.

    Mirrors `get_3d_sincos_pos_embed_from_grid` (reference
    `embeddings.py:35-51`): concat of per-axis 1D embeddings over (x, y, z).
    """
    assert embed_dim % 3 == 0
    shape = grid_xyz.shape[:-1]
    emb = jnp.concatenate(
        [
            sincos_1d(embed_dim // 3, grid_xyz[..., 0]),
            sincos_1d(embed_dim // 3, grid_xyz[..., 1]),
            sincos_1d(embed_dim // 3, grid_xyz[..., 2]),
        ],
        axis=-1,
    )
    return emb.reshape(*shape, embed_dim)


def _interleaved_sincos(v: jax.Array, c: int) -> jax.Array:
    """[..., 1] coords -> [..., C] with even channels sin, odd channels cos.

    div_term_i = (2i) * 1000 / C for i in [0, C/2), as in reference
    `embeddings.py:119-131`.
    """
    div_term = (jnp.arange(0, c, 2, dtype=jnp.float32) * (1000.0 / c)).reshape(
        *([1] * (v.ndim - 1)), c // 2
    )
    s = jnp.sin(v * div_term)  # [..., C/2]
    co = jnp.cos(v * div_term)
    # Interleave: out[..., 0::2] = sin, out[..., 1::2] = cos.
    return jnp.stack([s, co], axis=-1).reshape(*v.shape[:-1], c)


def coord_embedding_2d(xy: jax.Array, c: int, cat_coords: bool = True) -> jax.Array:
    """Mirrors `get_2d_embedding` (reference `embeddings.py:113-134`).

    NOTE the reference quirk: for 2D the raw coords are PREPENDED
    (``cat([xy, pe])``), unlike 3D/4D where they are appended.
    """
    pe = jnp.concatenate(
        [_interleaved_sincos(xy[..., 0:1], c), _interleaved_sincos(xy[..., 1:2], c)],
        axis=-1,
    )
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)
    return pe


def coord_embedding_3d(xyz: jax.Array, c: int, cat_coords: bool = True) -> jax.Array:
    """Flow embedding; mirrors `get_3d_embedding` (reference
    `embeddings.py:137-162`). Output [..., 3*C (+3)]; coords appended."""
    pe = jnp.concatenate(
        [
            _interleaved_sincos(xyz[..., 0:1], c),
            _interleaved_sincos(xyz[..., 1:2], c),
            _interleaved_sincos(xyz[..., 2:3], c),
        ],
        axis=-1,
    )
    if cat_coords:
        pe = jnp.concatenate([pe, xyz], axis=-1)
    return pe


def coord_embedding_4d(xyzw: jax.Array, c: int, cat_coords: bool = True) -> jax.Array:
    """Mirrors `get_4d_embedding` (reference `embeddings.py:165-196`)."""
    pe = jnp.concatenate(
        [_interleaved_sincos(xyzw[..., i : i + 1], c) for i in range(4)], axis=-1
    )
    if cat_coords:
        pe = jnp.concatenate([pe, xyzw], axis=-1)
    return pe


def fourier_embedding(
    x: jax.Array,
    n_freqs: int,
    max_freq_log2: float,
    include_input: bool = True,
    log_sampling: bool = True,
    rescale: float = 1.0,
) -> jax.Array:
    """Fourier feature embedding; mirrors `Embedder_Fourier`
    (reference `embeddings.py:202-256`)."""
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, max_freq_log2, n_freqs)
    else:
        freqs = jnp.linspace(2.0**0.0, 2.0**max_freq_log2, n_freqs)
    out = []
    if include_input:
        out.append(x / rescale)
    for i in range(n_freqs):
        out.append(jnp.sin(x * freqs[i]))
        out.append(jnp.cos(x * freqs[i]))
    return jnp.concatenate(out, axis=-1)
