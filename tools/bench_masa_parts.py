"""Decompose masa_match_and_warp (21.7 ms of the 512 px flagship forward,
tools/bench_fwd_parts.py round 4) into stages on the real chip:

  coarse    — haloed block extraction + multi-dilation coarse search
  fine      — deepest-window gather + dense fine correlation
  gather    — per-level ref window gathers (all levels)
  transfer  — per-level masa_transfer folds (all levels)
  full      — masa_match_and_warp end-to-end (cross-check)

Shapes mirror the flagship: MASAEncoder nf=48 pyramid at 512 px
(levels 512/48, 256/96, 128/192, 64/384), lr_block_size 8.

Usage: python tools/bench_masa_parts.py [part ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("TDR_BENCH_SIZE", "512"))
ITERS = 10
REPEATS = 3
DT = jnp.bfloat16


def timed(fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def chain(body, x0):
    """Chained fori_loop protocol: body(x) -> (x', scalar)."""
    def outer(x):
        def step(_, carry):
            xc, acc = carry
            xn, s = body(xc)
            return (xn, acc + s)
        return jax.lax.fori_loop(0, ITERS, step, (x, jnp.zeros(())))[1]
    return outer


def main():
    from textualdegremoval_tpu.ops import masa as M

    parts = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "coarse", "fine", "gather", "transfer", "full"]

    key = jax.random.PRNGKey(0)
    h = w = SIZE // 8
    n = 1
    nscales = 4
    pyramid = []
    for lv in range(nscales):
        s = 2 ** (nscales - 1 - lv)
        c = 48 * (2 ** lv)
        pyramid.append(jax.random.normal(
            jax.random.fold_in(key, lv), (n, h * s, w * s, c), DT))
    feat_lq = jax.random.normal(key, (n, h, w, 48 * 8), DT)
    deep_ref = pyramid[-1]
    c = feat_lq.shape[-1]
    hr, wr = h, w

    lr_block_size = 8
    px = max(w // lr_block_size, 1)
    py = max(h // lr_block_size, 1)
    kx, ky = w // px, h // py
    diameter_x = min(2 * int(wr / (2 * px) * 1.5) + 1, wr - 2)
    diameter_y = min(2 * int(hr / (2 * py) * 1.5) + 1, hr - 2)
    d2y, d2x = diameter_y + 2, diameter_x + 2
    nb = n * py * px

    def extract_blocks(feat):
        lq_pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        bl = jax.lax.conv_general_dilated_patches(
            lq_pad, filter_shape=(ky + 2, kx + 2),
            window_strides=(ky, kx), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bl = bl.reshape(n, py * px, c, ky + 2, kx + 2)
        return bl.transpose(0, 1, 3, 4, 2)

    lq_blocks = jax.jit(extract_blocks)(feat_lq)
    top1 = jax.jit(lambda b, r: M.masa_coarse_search(b, r))(
        lq_blocks, deep_ref)
    y1, x1 = M.masa_window_corners(top1, hr, wr, diameter_y, diameter_x)
    win_deep = jax.jit(
        lambda f, a, b: M.masa_gather_windows(f, a, b, d2y, d2x, 1))(
        deep_ref, y1, x1)
    index, soft_att = jax.jit(
        lambda l, wd: M.masa_fine_search(
            l.reshape(nb, ky + 2, kx + 2, c),
            wd.reshape(nb, d2y, d2x, c)))(lq_blocks, win_deep)

    if "coarse" in parts:
        def body(f):
            bl = extract_blocks(f)
            t1 = M.masa_coarse_search(bl, deep_ref)
            s = jnp.sum(t1.astype(jnp.float32)) * 1e-6
            return f + (s * 1e-12).astype(f.dtype), s
        t = timed(chain(body, feat_lq), feat_lq)
        print(json.dumps({"part": "coarse", "ms": round(t * 1e3, 3)}),
              flush=True)

    if "fine" in parts:
        def body(f):
            bl = extract_blocks(f)
            wd = M.masa_gather_windows(deep_ref, y1, x1, d2y, d2x, 1)
            idx, sa = M.masa_fine_search(
                bl.reshape(nb, ky + 2, kx + 2, c),
                wd.reshape(nb, d2y, d2x, c))
            s = jnp.sum(sa) * 1e-6 + jnp.sum(idx.astype(jnp.float32)) * 1e-9
            return f + (s * 1e-12).astype(f.dtype), s
        t = timed(chain(body, feat_lq), feat_lq)
        print(json.dumps({"part": "fine(+deep gather)",
                          "ms": round(t * 1e3, 3)}), flush=True)

    if "gather" in parts:
        for lv in range(nscales):
            scale = 2 ** (nscales - 1 - lv)
            feat = pyramid[lv]

            def body(f, feat=feat, scale=scale):
                wn = M.masa_gather_windows(feat, y1, x1, d2y, d2x, scale)
                s = jnp.sum(jnp.abs(wn.astype(jnp.float32))) * 1e-6
                return f + (s * 1e-12).astype(f.dtype), s
            t = timed(chain(body, feat_lq), feat_lq)
            print(json.dumps({"part": f"gather_s{scale}",
                              "ms": round(t * 1e3, 3)}), flush=True)

    if "transfer" in parts:
        for lv in range(nscales):
            scale = 2 ** (nscales - 1 - lv)
            feat = pyramid[lv]
            win = jax.jit(
                lambda f, a, b, s=scale: M.masa_gather_windows(
                    f, a, b, d2y, d2x, s))(feat, y1, x1)
            win = win.reshape(nb, d2y * scale, d2x * scale, feat.shape[-1])

            def body(f, win=win, scale=scale):
                wp = M.masa_transfer(win, index, soft_att, 3, scale)
                s = jnp.sum(jnp.abs(wp.astype(jnp.float32))) * 1e-6
                return f + (s * 1e-12).astype(f.dtype), s
            t = timed(chain(body, feat_lq), feat_lq)
            print(json.dumps({"part": f"transfer_s{scale}",
                              "ms": round(t * 1e3, 3)}), flush=True)

    if "full" in parts:
        def body(f):
            warps = M.masa_match_and_warp(f, pyramid, lr_block_size)
            s = sum(jnp.sum(jnp.abs(w.astype(jnp.float32))) for w in warps)
            s = s * 1e-6
            return f + (s * 1e-12).astype(f.dtype), s
        t = timed(chain(body, feat_lq), feat_lq)
        print(json.dumps({"part": "full_match_warp",
                          "ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
