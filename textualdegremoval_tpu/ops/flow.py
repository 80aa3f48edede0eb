"""Optical-flow warping utilities (reference
models/archs/nafnet_arch_utils.py:125-190 flow_warp / resize_flow).

Not on the reference's hot path, but part of the NAFNet utility surface;
implemented with jax bilinear/nearest gather for completeness."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray,
              interp_mode: str = "bilinear",
              padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp an NHWC image by per-pixel flow (B, H, W, 2) in (x, y) order,
    equivalent to grid_sample(align_corners=True) on grid+flow."""
    b, h, w, c = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    vx = gx[None] + flow[..., 0]
    vy = gy[None] + flow[..., 1]

    def sample(img, yy, xx):
        if interp_mode == "nearest":
            yi = jnp.round(yy).astype(jnp.int32)
            xi = jnp.round(xx).astype(jnp.int32)
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            out = img[yi, xi]
            if padding_mode == "zeros":
                out = out * valid[..., None].astype(out.dtype)
            return out
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy = (yy - y0)[..., None]
        wx = (xx - x0)[..., None]

        def g(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            v = img[jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                    jnp.clip(xi, 0, w - 1).astype(jnp.int32)]
            if padding_mode == "zeros":
                v = v * valid[..., None].astype(v.dtype)
            return v

        return ((1 - wy) * (1 - wx) * g(y0, x0)
                + (1 - wy) * wx * g(y0, x0 + 1)
                + wy * (1 - wx) * g(y0 + 1, x0)
                + wy * wx * g(y0 + 1, x0 + 1))

    return jax.vmap(sample)(x, vy, vx)


def resize_flow(flow: jnp.ndarray, size_type: str, sizes,
                interp_mode: str = "bilinear") -> jnp.ndarray:
    """Resize a flow field and scale its values accordingly."""
    b, h, w, _ = flow.shape
    if size_type == "ratio":
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    else:  # 'shape'
        out_h, out_w = sizes
    scaled = flow * jnp.asarray([out_w / w, out_h / h], flow.dtype)
    return jax.image.resize(scaled, (b, out_h, out_w, 2), interp_mode)
