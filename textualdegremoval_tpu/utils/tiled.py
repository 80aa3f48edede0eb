"""Tiled whole-image inference with overlap blending.

For test images too large for one forward pass (the alternative to dp x sp
spatial sharding when running single-chip): split the LQ into overlapping
tiles, run the (jitted, shape-cached) network per tile, blend with linear
ramps in the overlap bands.  The reference processes whole images with
window padding (pad_test); tiling extends that to arbitrarily large inputs
at constant memory.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _ramp_weights(tile: int, overlap: int) -> np.ndarray:
    w = np.ones(tile, np.float32)
    if overlap > 0:
        ramp = np.linspace(0.0, 1.0, overlap + 2, dtype=np.float32)[1:-1]
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def infer_tiled(fwd, lq, ref=None, tile: int = 512, overlap: int = 64):
    """fwd: (lq_tile[, ref]) -> pred tile (same HW).  lq: (1, H, W, C).
    ref (optional): passed whole to every tile (the MASA search sees the
    full reference regardless of which LQ tile is being restored).
    Returns (1, H, W, C) numpy array."""
    _, h, w, c = lq.shape
    if h <= tile and w <= tile:
        out = fwd(lq, ref) if ref is not None else fwd(lq)
        return np.asarray(out[-1] if isinstance(out, (list, tuple)) else out)

    stride = tile - overlap
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)

    acc = np.zeros((h, w, c), np.float32)
    norm = np.zeros((h, w, 1), np.float32)
    wt = _ramp_weights(tile, overlap)
    w2d = (wt[:, None] * wt[None, :])[..., None]
    for y in ys:
        for x in xs:
            tile_lq = lq[:, y : y + tile, x : x + tile]
            out = fwd(tile_lq, ref) if ref is not None else fwd(tile_lq)
            if isinstance(out, (list, tuple)):
                out = out[-1]
            acc[y : y + tile, x : x + tile] += np.asarray(out)[0] * w2d
            norm[y : y + tile, x : x + tile] += w2d[..., :1]
    return (acc / np.maximum(norm, 1e-8))[None]
