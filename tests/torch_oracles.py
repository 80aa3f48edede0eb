"""Hand-written PyTorch oracles for golden tests.

These implement the *documented algorithms* (SURVEY.md §2/§3) from scratch in
torch so the JAX ops can be verified numerically.  They are test-only code —
nothing here ships in the framework.
"""

import torch
import torch.nn.functional as F


def masa_oracle(
    feat_lq_deep: torch.Tensor,  # (N, C, H, W)
    feat_ref_pyramid: list[torch.Tensor],  # shallow->deep, NCHW
    lr_block_size: int,
    ref_down_block_size: float = 1.5,
    psize: int = 3,
    dilations=(1, 2, 3),
) -> list[torch.Tensor]:
    """MASA coarse search -> window gather -> fine search -> transfer.

    Returns the warp pyramid shallow->deep in NCHW.
    """
    n, c, h, w = feat_lq_deep.shape
    deep_ref = feat_ref_pyramid[-1]
    _, _, hr, wr = deep_ref.shape
    nscales = len(feat_ref_pyramid)

    px, py = max(w // lr_block_size, 1), max(h // lr_block_size, 1)
    kx, ky = w // px, h // py
    dx = 2 * int(wr / (2 * px) * ref_down_block_size) + 1
    dy = 2 * int(hr / (2 * py) * ref_down_block_size) + 1
    dx, dy = min(dx, wr - 2), min(dy, hr - 2)
    d2y, d2x = dy + 2, dx + 2

    # haloed blocks
    lq_pad = F.pad(feat_lq_deep, (1, 1, 1, 1), mode="replicate")
    blocks = F.unfold(lq_pad, kernel_size=(ky + 2, kx + 2), stride=(ky, kx))
    blocks = blocks.view(n, c, ky + 2, kx + 2, py * px).permute(0, 4, 1, 2, 3)

    # coarse: multi-dilation center-patch correlation
    cy, cx = (ky + 2) // 2, (kx + 2) // 2
    corr_sum = 0.0
    for d in dilations:
        refp = F.unfold(deep_ref, kernel_size=3, padding=d, dilation=d)  # (N, 9c, hr*wr)
        ctr = blocks[:, :, :, cy - d : cy + d + 1 : d, cx - d : cx + d + 1 : d]
        ctr = ctr.reshape(n, py * px, c * 9)
        corr_sum = corr_sum + torch.bmm(
            F.normalize(ctr, dim=2), F.normalize(refp, dim=1)
        )
    top1 = corr_sum.argmax(dim=-1)  # (N, pb)

    # clamped window corners
    x1 = (top1 % wr - dx // 2 - 1).clamp(0, wr - dx - 2)
    y1 = (top1 // wr - dy // 2 - 1).clamp(0, hr - dy - 2)

    def gather_windows(feat, s):
        _, cs, _, _ = feat.shape
        iy = y1[..., None] * s + torch.arange(d2y * s)  # (N, pb, d2y*s)
        ix = x1[..., None] * s + torch.arange(d2x * s)
        nidx = torch.arange(n)[:, None, None, None]
        win = feat.permute(0, 2, 3, 1)[
            nidx, iy[:, :, :, None], ix[:, :, None, :]
        ]  # (N, pb, d2y*s, d2x*s, C)
        return win.permute(0, 1, 4, 2, 3).reshape(n * py * px, cs, d2y * s, d2x * s)

    # fine search: dense valid 3x3 correlation
    blocks_f = blocks.reshape(n * py * px, c, ky + 2, kx + 2)
    win_deep = gather_windows(deep_ref, 1)
    lq_unf = F.unfold(blocks_f, kernel_size=psize).permute(0, 2, 1)  # (NB, ky*kx, 9c)
    ref_unf = F.unfold(win_deep, kernel_size=psize)  # (NB, 9c, R)
    corr = torch.bmm(F.normalize(lq_unf, dim=2), F.normalize(ref_unf, dim=1))
    soft_att, index = corr.max(dim=-1)  # (NB, ky*kx)
    index = index.view(-1, ky, kx)
    soft_att = soft_att.view(-1, 1, ky, kx)

    def bis(inp, dim, idx):
        views = [inp.size(0)] + [1 if i != dim else -1 for i in range(1, inp.dim())]
        expanse = list(inp.size())
        expanse[0] = -1
        expanse[dim] = -1
        idx = idx.clone().view(views).expand(expanse)
        return torch.gather(inp, dim, idx)

    def transfer(win, s):
        k = psize * s
        unf = F.unfold(win, kernel_size=k, stride=s)  # (NB, C*k*k, R)
        sel = bis(unf, 2, index.view(index.size(0), -1))
        div = torch.ones_like(sel)
        out = F.fold(sel, (ky * s, kx * s), kernel_size=k, padding=(psize // 2) * s, stride=s)
        div = F.fold(div, (ky * s, kx * s), kernel_size=k, padding=(psize // 2) * s, stride=s)
        att = F.interpolate(soft_att, size=(ky * s, kx * s), mode="bilinear")
        return out / div * att

    warps = []
    for level in range(nscales):
        s = 2 ** (nscales - 1 - level)
        win = gather_windows(feat_ref_pyramid[level], s)
        wp = transfer(win, s)  # (NB, C_s, ky*s, kx*s)
        cs = wp.size(1)
        wp = wp.view(n, py, px, cs, ky * s, kx * s).permute(0, 3, 1, 4, 2, 5)
        warps.append(wp.reshape(n, cs, py * ky * s, px * kx * s))
    return warps
