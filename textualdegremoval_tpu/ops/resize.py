"""Spatial resizing primitives in NHWC with torch-compatible channel order.

PixelShuffle/PixelUnshuffle keep PyTorch's (C, r, r) channel packing so that
converted checkpoints (reference Up/Downsample modules,
models/archs/network_restormer_guided_arch.py:372-391 and NAFNet up path
network_nafnet_guided_arch.py:341-346) reproduce outputs bit-for-bit in f32.
"""

import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel-unshuffle: (B, H, W, C) -> (B, H/r, W/r, C*r*r).

    Output channel index = c*r*r + i*r + j  (torch ordering), where (i, j)
    is the intra-block pixel offset.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    # -> (b, h/r, w/r, c, i, j)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel-shuffle: (B, H, W, C*r*r) -> (B, H*r, W*r, C).

    Input channel index interpreted as c*r*r + i*r + j (torch ordering).
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    # -> (b, h, i, w, j, c)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def pad_to_multiple(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Zero-pad H and W (bottom/right) to the next multiple.

    Reference semantics: check_image_size
    (network_nafnet_guided_arch.py:576-585).  Under jit the pad amounts are
    static because shapes are static.
    """
    b, h, w, c = x.shape
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


def bilinear_resize_torch(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(mode='bilinear',
    align_corners=False, antialias=False) for BOTH up- and down-scaling.

    jax.image.resize antialiases on downscale (area-weighted kernel), which
    diverges from torch; this samples exactly 4 neighbors at half-pixel
    source coordinates.  NHWC."""
    b, h, w, c = x.shape
    if (oh, ow) == (h, w):
        return x

    def axis_coords(out_len, in_len):
        pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * (
            in_len / out_len) - 0.5
        lo = jnp.clip(jnp.floor(pos), 0, in_len - 1)
        hi = jnp.clip(lo + 1, 0, in_len - 1)
        frac = jnp.clip(pos - lo, 0.0, 1.0)
        return lo.astype(jnp.int32), hi.astype(jnp.int32), frac

    y0, y1, fy = axis_coords(oh, h)
    x0, x1, fx = axis_coords(ow, w)
    fy = fy[None, :, None, None].astype(x.dtype)
    fx = fx[None, None, :, None].astype(x.dtype)
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy
