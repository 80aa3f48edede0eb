"""MASA-style cross-image patch search + transfer, TPU-native.

Re-design of the reference's MASA module (canonical copy:
models/archs/network_nafnet_guided_arch.py:483-709, duplicated in all five
guided archs).  What it computes:

1. Split the deepest LQ feature map into a grid of py*px blocks (with a
   1-pixel replicate halo).
2. **Coarse search**: for each block, correlate its center 3x3 patch (at
   dilations {1,2,3}, L2-normalized) against every 3x3 patch of the deepest
   ref feature; top-1 position selects a (diameter+2)^2 candidate window in
   the ref, clamped to borders.
3. Gather that window *at every pyramid scale* (x1 deepest .. x{2^(S-1)}
   full-res).
4. **Fine search**: dense normalized 3x3 correlation between all patches of
   the LQ block and all patches of its ref window -> per-pixel top-1 index +
   soft attention score.
5. **Transfer**: for each scale, gather the selected (psize*s)^2 ref patches
   and overlap-add fold them (divisor-normalized), scaled by the bilinearly
   resized soft attention -> a warped ref feature pyramid aligned to the LQ.

TPU-first implementation decisions (vs. the CUDA/torch original):
* All shapes are static given the (padded) input shape: px, py, diameters,
  window sizes are Python ints at trace time -> single XLA program, MXU
  matmuls for both correlation products.
* `F.unfold` -> `lax.conv_general_dilated_patches` (one fused op);
  `F.fold` -> overlap-add expressed as psize^2 shifted adds (no scatter);
  per-image `make_grid` loops -> one batched gather.
* Correlation matmuls feed multiplicands in the INPUT dtype and accumulate
  in float32 (``preferred_element_type``); norms/denominators are float32
  throughout.  Under f32 inputs this is exact.  Under bf16 training the
  multiplicand rounding is ~0.4% relative, which can flip a near-tie argmax
  match selection vs an all-f32 search — an alignment choice between two
  almost-equally-correlated ref patches, not a numeric error in the warped
  features (the transfer gathers keep the input dtype either way).  The
  parity tests and the eval CLI run f32, where selection is exact; keeping
  the MXU matmul in bf16 under bf16 training is the measured-faster choice.
* Fixes the reference's shipped index bug (SURVEY.md §2.5 item 1) by
  construction: the pyramid is a list whose deepest entry is always
  `feats[-1]`, and warp scales are derived from the pyramid length.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# unfold / fold primitives
# ---------------------------------------------------------------------------


def unfold_nhwc(
    x: jnp.ndarray,
    ks: int,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """torch-F.unfold-compatible patch extraction on NHWC.

    Returns (N, Lh, Lw, C*ks*ks) where the last axis is ordered
    channel-major: index = c*ks*ks + ki*ks + kj (same as torch.unfold).

    Stride-1 unfolds are ks^2 shifted slices stacked (pure data movement;
    the autodiff transpose is the mirrored pad-and-add).  The
    `conv_general_dilated_patches` identity-conv form costs ks^2 MACs per
    copied element forward, and its dgrad lowers through the conv emitter
    as a dense transposed conv over C*ks^2 channels — the same multi-TFLOP
    copy-transpose that dominated the MASA block extraction (BENCH_NOTES
    round 5).  Strided unfolds keep the fused conv form.
    """
    if stride == 1:
        n, h, w, c = x.shape
        xp = (jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                          (0, 0))) if padding else x)
        oh = h + 2 * padding - dilation * (ks - 1)
        ow = w + 2 * padding - dilation * (ks - 1)
        views = [
            xp[:, ki * dilation : ki * dilation + oh,
               kj * dilation : kj * dilation + ow, :]
            for ki in range(ks) for kj in range(ks)
        ]
        stacked = jnp.stack(views, axis=-1)  # (N, oh, ow, C, ks*ks)
        return stacked.reshape(n, oh, ow, c * ks * ks)
    patches = lax.conv_general_dilated_patches(
        x,
        filter_shape=(ks, ks),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return patches


def fold_overlap_add(
    patches: jnp.ndarray,
    psize: int,
    scale: int,
) -> jnp.ndarray:
    """torch-F.fold equivalent for the MASA transfer geometry.

    Args:
      patches: (N, Lh, Lw, C*k*k) with channel-major (c, ki, kj) ordering and
        k = psize*scale (odd psize).
      psize: base patch size (kernel = psize*scale, stride = scale,
        padding = (psize//2)*scale).
    Returns:
      (N, Lh*scale, Lw*scale, C) overlap-added canvas (NOT divisor
      normalized — see fold_divisor).
    """
    n, lh, lw, ckk = patches.shape
    k = psize * scale
    c = ckk // (k * k)
    p = patches.reshape(n, lh, lw, c, psize, scale, psize, scale)
    # -> (n, lh, lw, psize, psize, scale, scale, c)
    p = p.transpose(0, 1, 2, 4, 6, 5, 7, 3)
    canvas = jnp.zeros(
        (n, lh + psize - 1, lw + psize - 1, scale, scale, c), dtype=patches.dtype
    )
    for a in range(psize):
        for b in range(psize):
            canvas = canvas.at[:, a : a + lh, b : b + lw].add(p[:, :, :, a, b])
    # (n, LH, s, LW, s, c) -> image
    canvas = canvas.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, (lh + psize - 1) * scale, (lw + psize - 1) * scale, c
    )
    crop = (psize // 2) * scale
    return canvas[:, crop : crop + lh * scale, crop : crop + lw * scale]


def fold_divisor(lh: int, lw: int, psize: int, scale: int) -> jnp.ndarray:
    """Overlap-count normalizer for fold_overlap_add (data-independent;
    XLA constant-folds it)."""
    ones = jnp.ones((1, lh, lw, psize * scale * psize * scale), jnp.float32)
    return fold_overlap_add(ones, psize, scale)


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------


def masa_coarse_search(
    lq_blocks: jnp.ndarray,
    ref_feat: jnp.ndarray,
    dilations=(1, 2, 3),
) -> jnp.ndarray:
    """Multi-dilation center-patch correlation; top-1 over ref positions.

    Shift-matmul formulation: the normalized patch correlation
    <p, r>/(|p||r|) is computed as one MXU matmul per dilation against a
    9-shifted-slice concatenation of the ref feature (pure data movement in
    the input dtype), with both norms applied POST-hoc — the patch norm from
    the patch itself, the ref-patch norm from a 3x3 box sum of the
    channel-squared map (zero padding reproduces torch-unfold border
    semantics).  vs. the previous unfold_nhwc form this removes the
    (Hr*Wr, 9C) f32 materialization AND the one-hot depthwise conv that
    `conv_general_dilated_patches` lowers to — measured 6.85 ms -> MXU
    matmul + O(HW) VPU maps at the flagship deepest level (512 px, C=384).

    Args:
      lq_blocks: (N, pb, ky+2, kx+2, C) haloed LQ blocks of the deepest
        feature.
      ref_feat: (N, Hr, Wr, C) deepest ref feature.
    Returns:
      (N, pb) int32 flat index into Hr*Wr of the best match.
    """
    n, pb, kyh, kxh, c = lq_blocks.shape
    _, hr, wr, _ = ref_feat.shape
    cy, cx = kyh // 2, kxh // 2  # center of the haloed block

    # A dilation only fits if the 3x3 dilated center patch stays inside the
    # haloed block (the reference would raise on such shapes; here small
    # blocks gracefully use the dilations that fit).
    dilations = [
        d for d in dilations
        if cy - d >= 0 and cy + d < kyh and cx - d >= 0 and cx + d < kxh
    ] or [1]

    # channel-sum-of-squares map for the ref-patch norms (f32, (N,Hr,Wr))
    sq = jnp.sum(jnp.square(ref_feat.astype(jnp.float32)), axis=-1)

    corr_sum = jnp.zeros((n, pb, hr * wr), jnp.float32)
    for d in dilations:
        # center 3x3 dilated patch, ordered (a, b, c) to match the ref concat
        patch = lq_blocks[:, :, cy - d : cy + d + 1 : d,
                          cx - d : cx + d + 1 : d, :]
        pnorm = jnp.sqrt(jnp.sum(
            jnp.square(patch.astype(jnp.float32)), axis=(2, 3, 4)))  # (N, pb)
        patch = patch.reshape(n, pb, 9 * c)

        refp = jnp.pad(ref_feat, ((0, 0), (d, d), (d, d), (0, 0)))
        sqp = jnp.pad(sq, ((0, 0), (d, d), (d, d)))
        shifts = []
        rn2 = jnp.zeros((n, hr, wr), jnp.float32)
        for a in range(3):
            for b in range(3):
                shifts.append(
                    refp[:, a * d : a * d + hr, b * d : b * d + wr, :])
                rn2 = rn2 + sqp[:, a * d : a * d + hr, b * d : b * d + wr]
        ref_cat = jnp.concatenate(shifts, axis=-1).reshape(n, hr * wr, 9 * c)
        rnorm = jnp.sqrt(rn2).reshape(n, hr * wr)

        raw = jnp.einsum("npk,nrk->npr", patch, ref_cat,
                         preferred_element_type=jnp.float32)
        denom = (jnp.maximum(pnorm, 1e-12)[:, :, None]
                 * jnp.maximum(rnorm, 1e-12)[:, None, :])
        corr_sum = corr_sum + raw / denom
    return jnp.argmax(corr_sum, axis=-1).astype(jnp.int32)


def masa_window_corners(
    index: jnp.ndarray, hr: int, wr: int, diameter_y: int, diameter_x: int
):
    """Convert flat top-1 indices into clamped window corner coordinates.

    Window spans [y1, y1 + diameter_y + 2) x [x1, x1 + diameter_x + 2);
    clamping reproduces the reference's sequential border masks
    (network_nafnet_guided_arch.py:634-657), which reduce to a clip.
    """
    idx_x = index % wr
    idx_y = index // wr
    x1 = jnp.clip(idx_x - diameter_x // 2 - 1, 0, wr - diameter_x - 2)
    y1 = jnp.clip(idx_y - diameter_y // 2 - 1, 0, hr - diameter_y - 2)
    return y1, x1


def masa_gather_windows(
    feat: jnp.ndarray,
    y1: jnp.ndarray,
    x1: jnp.ndarray,
    d2y: int,
    d2x: int,
    scale: int,
) -> jnp.ndarray:
    """Gather per-block ref windows from a pyramid level.

    Implemented as a double-vmapped `dynamic_slice` — XLA lowers this to a
    block-granular gather (pb contiguous window copies per image) instead of
    the per-element gather an advanced-indexing formulation produces, which
    is an order of magnitude faster on TPU.

    The BACKWARD is a custom vjp: the autodiff transpose of a vmapped
    dynamic_slice is an element-granular overlapping scatter-add (slow path
    on TPU — it dominated the match+warp backward, see BENCH_NOTES round 5);
    here it is a sequential fori_loop of block-granular
    read-add-`dynamic_update_slice` writes — N*pb in-place window updates,
    each a contiguous copy, no scatter.  Same accumulation dtype and order
    semantics (addition is commutative up to float rounding).

    Args:
      feat: (N, Hr*scale, Wr*scale, C_s) ref feature at this level.
      y1, x1: (N, pb) window corners at deepest-scale coordinates.
      d2y, d2x: window size at deepest scale (diameter+2).
    Returns:
      (N, pb, d2y*scale, d2x*scale, C_s).
    """
    return _gather_windows(feat, y1, x1, d2y, d2x, scale,
                           feat.shape, feat.dtype.name)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gather_windows(feat, y1, x1, d2y, d2x, scale, shape, dtype_name):
    c = feat.shape[-1]

    def slice_one(img, yy, xx):
        return lax.dynamic_slice(
            img, (yy * scale, xx * scale, 0), (d2y * scale, d2x * scale, c)
        )

    per_image = jax.vmap(slice_one, in_axes=(None, 0, 0))  # over blocks
    return jax.vmap(per_image, in_axes=(0, 0, 0))(feat, y1, x1)


def _gather_windows_fwd(feat, y1, x1, d2y, d2x, scale, shape, dtype_name):
    out = _gather_windows(feat, y1, x1, d2y, d2x, scale, shape, dtype_name)
    return out, (y1, x1)


def _gather_windows_bwd(d2y, d2x, scale, shape, dtype_name, res, g):
    y1, x1 = res
    n, pb = y1.shape
    wy, wx, c = d2y * scale, d2x * scale, shape[-1]

    def body(i, buf):
        ni, bi = i // pb, i % pb
        y = y1[ni, bi] * scale
        x = x1[ni, bi] * scale
        gi = lax.dynamic_slice(g, (ni, bi, 0, 0, 0), (1, 1, wy, wx, c))
        cur = lax.dynamic_slice(buf, (ni, y, x, 0), (1, wy, wx, c))
        return lax.dynamic_update_slice(buf, cur + gi[0], (ni, y, x, 0))

    buf = lax.fori_loop(0, n * pb, body, jnp.zeros(shape, g.dtype))
    zero_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return buf.astype(dtype_name), zero_int(y1), zero_int(x1)


_gather_windows.defvjp(_gather_windows_fwd, _gather_windows_bwd)


def masa_fine_search(
    lq_blocks: jnp.ndarray,
    ref_windows: jnp.ndarray,
    psize: int = 3,
):
    """Dense valid 3x3 correlation of LQ block patches vs ref window patches.

    Args:
      lq_blocks: (NB, ky+2, kx+2, C) — haloed blocks, flattened batch.
      ref_windows: (NB, d2y, d2x, C) deepest-scale windows.
    Returns:
      index: (NB, ky, kx) int32 into the (d2y-2)*(d2x-2) patch grid.
      soft_att: (NB, ky, kx) float32 top-1 correlation score.
    """
    nb, kyh, kxh, c = lq_blocks.shape
    _, d2y, d2x, _ = ref_windows.shape
    ky, kx = kyh - 2, kxh - 2
    ry, rx = d2y - psize + 1, d2x - psize + 1

    # Shift-matmul form (see masa_coarse_search): valid 3x3 patches of both
    # sides as psize^2 shifted-slice concatenations in the input dtype, one
    # batched MXU matmul, norms applied post-hoc from channel-squared box
    # sums.  soft_att gradients flow through the matmul and the norms
    # (psize^2 cheap slice-adds) instead of an unfold backward.
    def _cat_and_norm(x, oy, ox):
        sqm = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
        views, n2 = [], jnp.zeros((nb, oy, ox), jnp.float32)
        for a in range(psize):
            for b in range(psize):
                views.append(x[:, a : a + oy, b : b + ox, :])
                n2 = n2 + sqm[:, a : a + oy, b : b + ox]
        cat = jnp.concatenate(views, axis=-1).reshape(nb, oy * ox, -1)
        return cat, jnp.sqrt(n2).reshape(nb, oy * ox)

    lq_cat, lnorm = _cat_and_norm(lq_blocks, ky, kx)
    ref_cat, rnorm = _cat_and_norm(ref_windows, ry, rx)
    raw = jnp.einsum("nlk,nrk->nlr", lq_cat, ref_cat,
                     preferred_element_type=jnp.float32)
    corr = raw / (jnp.maximum(lnorm, 1e-12)[:, :, None]
                  * jnp.maximum(rnorm, 1e-12)[:, None, :])
    index = jnp.argmax(corr, axis=-1).astype(jnp.int32)
    soft = jnp.take_along_axis(corr, index[..., None], axis=-1)[..., 0]
    return index.reshape(nb, ky, kx), soft.reshape(nb, ky, kx)


def unfold_strided(x: jnp.ndarray, psize: int, scale: int) -> jnp.ndarray:
    """Unfold with kernel psize*scale and stride scale, as pure data movement.

    Because the stride divides the kernel, every patch is a (psize x psize)
    block of scale-sized tiles — so unfold is psize^2 shifted views stacked,
    not a conv.  The identity-kernel conv that
    `conv_general_dilated_patches` lowers to does k^2 MACs per output element
    (576x wasted work at scale 8) and dominated the whole MASA module before
    this rewrite.

    Returns (N, R, R, C*k*k) with torch-unfold channel-major ordering,
    R = d2 - psize + 1.
    """
    n, hs, ws, c = x.shape
    d2y, d2x = hs // scale, ws // scale
    ry, rx = d2y - psize + 1, d2x - psize + 1
    v = x.reshape(n, d2y, scale, d2x, scale, c)
    rows = []
    for a in range(psize):
        cols = []
        for b in range(psize):
            cols.append(v[:, a : a + ry, :, b : b + rx, :, :])
        rows.append(jnp.stack(cols, axis=0))
    arr = jnp.stack(rows, axis=0)  # (psize, psize, n, ry, s, rx, s, c)
    # -> (n, ry, rx, c, a, si, b, sj)
    arr = arr.transpose(2, 3, 5, 7, 0, 4, 1, 6)
    k = psize * scale
    return arr.reshape(n, ry, rx, c * k * k)


def _transfer_tiles(ref_window, nb, d2y, d2x, s, c):
    tiles = ref_window.reshape(nb, d2y, s, d2x, s, c)
    return tiles.transpose(0, 1, 3, 2, 4, 5).reshape(
        nb, d2y * d2x, s * s * c)


def _transfer_weights(index, psize, d2y, d2x):
    """Selection-count matrix of the MASA fold.

    W[l, p] = how many of output cell l's psize^2 neighboring grid cells
    selected window tile p (integer-valued, exactly representable in bf16),
    cnt[l] = number of in-bounds neighbors (the fold divisor).  Both are
    O(L * d2y*d2x) int math — tiny next to the tile payload.

    Returns (W (NB, ky*kx, d2y*d2x) f32, cnt (1, ky, kx, 1) f32).
    """
    nb, ky, kx = index.shape
    rx = d2x - psize + 1
    half = psize // 2
    iy = index // rx
    ix = index % rx
    cells = jnp.arange(d2y * d2x, dtype=jnp.int32)
    w = jnp.zeros((nb, ky * kx, d2y * d2x), jnp.float32)
    cnt = jnp.zeros((1, ky, kx, 1), jnp.float32)
    for a in range(psize):
        oy = a - half
        for b in range(psize):
            ox = b - half
            ly0, ly1 = max(0, oy), min(ky, ky + oy)
            lx0, lx1 = max(0, ox), min(kx, kx + ox)
            iy_sh = jnp.roll(iy, (oy, ox), axis=(1, 2))
            ix_sh = jnp.roll(ix, (oy, ox), axis=(1, 2))
            g = (iy_sh + a) * d2x + (ix_sh + b)  # (NB, ky, kx)
            valid = jnp.zeros((1, ky, kx, 1), jnp.float32)
            valid = valid.at[:, ly0:ly1, lx0:lx1].set(1.0)
            onehot = (g.reshape(nb, ky * kx, 1) == cells).astype(jnp.float32)
            w = w + onehot * valid.reshape(1, ky * kx, 1)
            cnt = cnt + valid
    return w, cnt


def masa_transfer(
    ref_window: jnp.ndarray,
    index: jnp.ndarray,
    soft_att: jnp.ndarray,
    psize: int,
    scale: int,
) -> jnp.ndarray:
    """Warp a ref window onto the LQ block grid at one pyramid scale.

    Semantics identical to the reference's unfold -> index-select -> fold(/
    divisor) chain (network_nafnet_guided_arch.py:538-555), but collapsed
    into ONE batched MXU matmul.  Key observations: (1) kernel =
    psize*scale with stride scale means every output (scale x scale) tile
    is covered by exactly the patches selected at its psize^2 neighboring
    grid cells, and each contribution is a whole aligned tile of the ref
    window; (2) summing whole tiles by data-dependent index is a linear map,
    so the entire overlap-add fold is

        out = (W @ tiles) / cnt,   W[l, p] = #neighbors of l that picked p

    with W integer-valued and index-only (built by psize^2 one-hot adds over
    the tiny (L, d2y*d2x) grid).  One (NB, L, P) x (NB, P, s*s*C) matmul
    reads the tile payload once and runs on the MXU; its autodiff backward
    is the transposed matmul — no gathers, no scatter-adds.  The previous
    formulation (psize^2 take_along_axis row-selections) lowered to
    per-element gathers on TPU and measured ~3 ms/level at the 512 px
    flagship; this one is roofline-bound on the single tile-payload read.

    Args:
      ref_window: (NB, d2y*scale, d2x*scale, C_s).
      index: (NB, ky, kx) int32 patch indices (deepest-scale grid).
      soft_att: (NB, ky, kx) correlation scores.
    Returns:
      (NB, ky*scale, kx*scale, C_s).
    """
    nb, ky, kx = index.shape
    s = scale
    hs, ws = ref_window.shape[1], ref_window.shape[2]
    c = ref_window.shape[-1]
    d2y, d2x = hs // s, ws // s
    dt = ref_window.dtype

    tiles = _transfer_tiles(ref_window, nb, d2y, d2x, s, c)
    w, cnt = _transfer_weights(index, psize, d2y, d2x)
    out = jnp.einsum("nlp,npc->nlc", w.astype(dt), tiles,
                     preferred_element_type=jnp.float32)
    out = out.reshape(nb, ky, kx, s * s * c) / cnt
    acc_dt = jnp.float32 if dt == jnp.float32 else dt
    out = out.astype(acc_dt)
    out = out.reshape(nb, ky, kx, s, s, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(nb, ky * s, kx * s, c)
    att = jax.image.resize(
        soft_att[..., None].astype(jnp.float32),
        (nb, ky * s, kx * s, 1),
        method="bilinear",
    ).astype(acc_dt)
    return (out * att).astype(dt)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def _blocks_to_image(x: jnp.ndarray, n: int, py: int, px: int) -> jnp.ndarray:
    """(N*py*px, bh, bw, C) -> (N, py*bh, px*bw, C)."""
    _, bh, bw, c = x.shape
    x = x.reshape(n, py, px, bh, bw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, py * bh, px * bw, c)


def masa_match_and_warp(
    feat_lq_deep: jnp.ndarray,
    feat_ref_pyramid: list[jnp.ndarray],
    lr_block_size: int,
    ref_down_block_size: float = 1.5,
    psize: int = 3,
    dilations=(1, 2, 3),
) -> list[jnp.ndarray]:
    """Full MASA: coarse search on the deepest level, window gather at every
    level, fine search, transfer.

    Args:
      feat_lq_deep: (N, H, W, C) deepest LQ feature (stride 2^(S-1)).
      feat_ref_pyramid: S ref features, shallow->deep:
        [(N, H*2^(S-1), W*2^(S-1), C0), ..., (N, H, W, C)].
      lr_block_size: block size at the deepest level (config lr_block_size).
    Returns:
      warp pyramid shallow->deep: [(N, H*2^(S-1), W*2^(S-1), C0), ...,
      (N, H, W, C)] aligned to the LQ coordinate frame.
    """
    n, h, w, c = feat_lq_deep.shape
    deep_ref = feat_ref_pyramid[-1]
    _, hr, wr, _ = deep_ref.shape
    nscales = len(feat_ref_pyramid)

    px = max(w // lr_block_size, 1)
    py = max(h // lr_block_size, 1)
    kx = w // px
    ky = h // py
    diameter_x = 2 * int(wr / (2 * px) * ref_down_block_size) + 1
    diameter_y = 2 * int(hr / (2 * py) * ref_down_block_size) + 1
    # Window must fit: clamp to ref extent.
    diameter_x = min(diameter_x, wr - 2)
    diameter_y = min(diameter_y, hr - 2)
    d2y, d2x = diameter_y + 2, diameter_x + 2

    # haloed LQ blocks (replicate border), block grid (py, px).  Extract the
    # (ky+2, kx+2) windows at stride (ky, kx) as (ky+2)*(kx+2) shifted
    # strided slices: stride+2-halo windows are pure data movement, and the
    # autodiff TRANSPOSE is the mirrored set of slice-adds.  The previous
    # `conv_general_dilated_patches` form lowered its dgrad through the conv
    # emitter as a dense transposed conv over C*(ky+2)*(kx+2) channels —
    # multi-TFLOP for a copy, and the single largest term of the train-step
    # backward (BENCH_NOTES round 5: the match+warp bwd was 49 ms while
    # every stage vjp summed to <5 ms).
    lq_pad = jnp.pad(feat_lq_deep, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    rows = []
    for a in range(ky + 2):
        cols = []
        for b in range(kx + 2):
            v = lax.slice(
                lq_pad, (0, a, b, 0),
                (n, a + (py - 1) * ky + 1, b + (px - 1) * kx + 1, c),
                (1, ky, kx, 1))  # (N, py, px, C)
            cols.append(v)
        rows.append(jnp.stack(cols, axis=3))  # (N, py, px, kx+2, C)
    bl = jnp.stack(rows, axis=3)  # (N, py, px, ky+2, kx+2, C)
    lq_blocks = bl.reshape(n, py * px, ky + 2, kx + 2, c)

    # coarse search + window corners
    top1 = masa_coarse_search(lq_blocks, deep_ref, dilations)
    y1, x1 = masa_window_corners(top1, hr, wr, diameter_y, diameter_x)

    # fine search on the deepest-scale window
    win_deep = masa_gather_windows(deep_ref, y1, x1, d2y, d2x, 1)
    nb = n * py * px
    lq_blocks_f = lq_blocks.reshape(nb, ky + 2, kx + 2, c)
    win_deep_f = win_deep.reshape(nb, d2y, d2x, c)
    index, soft_att = masa_fine_search(lq_blocks_f, win_deep_f, psize)

    # transfer at every scale (deep -> shallow scales 1, 2, 4, ...)
    warps = []
    for level in range(nscales):  # level 0 = shallowest (full res)
        scale = 2 ** (nscales - 1 - level)
        feat = feat_ref_pyramid[level]
        win = masa_gather_windows(feat, y1, x1, d2y, d2x, scale)
        win = win.reshape(nb, d2y * scale, d2x * scale, feat.shape[-1])
        warped = masa_transfer(win, index, soft_att, psize, scale)
        warps.append(_blocks_to_image(warped, n, py, px))
    return warps
