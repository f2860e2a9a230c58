"""Equiangular image convolution with periodic longitude padding.

XLA-native replacement of the reference's cuDNN `Conv2dEquiangular`
(reference: modules/layers.py:383-524): the equiangular sampling is a
regular lat/lon grid, so the node axis reshapes to (nlat, nlon) and a 2D
convolution applies, with circular padding along longitude and zero
padding along latitude. Uses lax.conv_general_dilated (MXU path).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["equiangular_conv2d", "equiangular_1d_to_2d", "equiangular_2d_to_1d"]


def equiangular_1d_to_2d(x: jnp.ndarray, nlat: int, nlon: int) -> jnp.ndarray:
    """[B, V, C] -> [B, nlat, nlon, C] (row-major rings, layers.py:408-426)."""
    B, V, C = x.shape
    assert V == nlat * nlon, f"V={V} != nlat*nlon={nlat * nlon}"
    return x.reshape(B, nlat, nlon, C)


def equiangular_2d_to_1d(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def equiangular_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray | None,
                       nlat: int, nlon: int,
                       periodic_padding: bool = True) -> jnp.ndarray:
    """2D convolution on the equiangular grid.

    x: [B, V, Cin]; kernel: [kh, kw, Cin, Cout] (HWIO); returns [B, V, Cout].
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    g = equiangular_1d_to_2d(x, nlat, nlon)
    # latitude: zero pad; longitude: circular pad (reference layers.py:475-481)
    pad_h = ((kh - 1) // 2, kh // 2)
    pad_w = ((kw - 1) // 2, kw // 2)
    if periodic_padding:
        g = jnp.concatenate(
            [g[:, :, -pad_w[0]:, :] if pad_w[0] else g[:, :, :0, :],
             g,
             g[:, :, : pad_w[1], :]],
            axis=2,
        )
        pad_w = (0, 0)
    # output in the compute dtype: preferred_element_type=f32 on bf16
    # operands broke the conv VJP (fp32 cotangent vs bf16 activation in
    # the transpose conv); the MXU accumulates fp32 internally for bf16
    # inputs either way
    out = lax.conv_general_dilated(
        g, kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return equiangular_2d_to_1d(out)
