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

    def select_patches(unf, idx):
        # batched index-select along the patch axis: (NB, C*k*k, R) gathered
        # at (NB, L) -> (NB, C*k*k, L), via plain batch indexing
        nb = unf.size(0)
        batch = torch.arange(nb).view(nb, 1).expand(-1, idx.size(1))
        return unf[batch, :, idx].permute(0, 2, 1)

    def transfer(win, s):
        k = psize * s
        unf = F.unfold(win, kernel_size=k, stride=s)  # (NB, C*k*k, R)
        sel = select_patches(unf, index.view(index.size(0), -1))
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


# ---------------------------------------------------------------------------
# Torch oracle models (tiny replicas built from the documented architecture,
# used to verify checkpoint conversion + full-model numerics).
# ---------------------------------------------------------------------------

import torch.nn as nn


class OLayerNorm(nn.Module):
    def __init__(self, dim, ln_type):
        super().__init__()
        self.ln_type = ln_type
        self.body = nn.Module()
        self.body.weight = nn.Parameter(torch.ones(dim))
        if ln_type == "WithBias":
            self.body.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        # x NCHW -> LN over C
        xp = x.permute(0, 2, 3, 1)
        var = xp.var(-1, keepdim=True, unbiased=False)
        if self.ln_type == "BiasFree":
            y = xp / torch.sqrt(var + 1e-5) * self.body.weight
        else:
            mu = xp.mean(-1, keepdim=True)
            y = (xp - mu) / torch.sqrt(var + 1e-5) * self.body.weight + self.body.bias
        return y.permute(0, 3, 1, 2)


class OMDTA(nn.Module):
    def __init__(self, dim, num_heads, bias):
        super().__init__()
        self.num_heads = num_heads
        self.temperature = nn.Parameter(torch.ones(num_heads, 1, 1))
        self.qkv = nn.Conv2d(dim, dim * 3, 1, bias=bias)
        self.qkv_dwconv = nn.Conv2d(dim * 3, dim * 3, 3, padding=1, groups=dim * 3, bias=bias)
        self.project_out = nn.Conv2d(dim, dim, 1, bias=bias)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv_dwconv(self.qkv(x))
        q, k, v = qkv.chunk(3, dim=1)
        hd = self.num_heads

        def heads(t):
            return t.view(b, hd, c // hd, h * w)

        q, k, v = heads(q), heads(k), heads(v)
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        out = attn.softmax(dim=-1) @ v
        out = out.view(b, c, h, w)
        return self.project_out(out)


class OGDFN(nn.Module):
    def __init__(self, dim, ffn_factor, bias):
        super().__init__()
        hidden = int(dim * ffn_factor)
        self.project_in = nn.Conv2d(dim, hidden * 2, 1, bias=bias)
        self.dwconv = nn.Conv2d(hidden * 2, hidden * 2, 3, padding=1, groups=hidden * 2, bias=bias)
        self.project_out = nn.Conv2d(hidden, dim, 1, bias=bias)

    def forward(self, x):
        x1, x2 = self.dwconv(self.project_in(x)).chunk(2, dim=1)
        return self.project_out(F.gelu(x1) * x2)


class OTransformerBlock(nn.Module):
    def __init__(self, dim, heads, ffn_factor, bias, ln_type, fusion=False):
        super().__init__()
        self.norm1 = OLayerNorm(dim, ln_type)
        self.attn = OMDTA(dim, heads, bias)
        self.norm2 = OLayerNorm(dim, ln_type)
        self.ffn = OGDFN(dim, ffn_factor, bias)
        self.fusion = fusion
        if fusion:
            self.alpha = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        sc = x
        x = x + self.attn(self.norm1(x))
        x = x + self.ffn(self.norm2(x))
        if self.fusion:
            return x * self.alpha + sc
        return x


class ODownsample(nn.Module):
    def __init__(self, n_feat):
        super().__init__()
        self.body = nn.Sequential(
            nn.Conv2d(n_feat, n_feat // 2, 3, padding=1, bias=False),
            nn.PixelUnshuffle(2),
        )

    def forward(self, x):
        return self.body(x)


class OUpsample(nn.Module):
    def __init__(self, n_feat):
        super().__init__()
        self.body = nn.Sequential(
            nn.Conv2d(n_feat, n_feat * 2, 3, padding=1, bias=False),
            nn.PixelShuffle(2),
        )

    def forward(self, x):
        return self.body(x)


class ORestormer(nn.Module):
    def __init__(self, inp_channels=3, out_channels=3, dim=8,
                 num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                 heads=(1, 1, 2, 2), ffn_factor=2.66, bias=False,
                 ln_type="WithBias"):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(inp_channels, dim, 3, padding=1, bias=bias)

        def seq(d, h, n):
            return nn.Sequential(*[
                OTransformerBlock(d, h, ffn_factor, bias, ln_type)
                for _ in range(n)])

        self.encoder_level1 = seq(dim, heads[0], num_blocks[0])
        self.down1_2 = ODownsample(dim)
        self.encoder_level2 = seq(dim * 2, heads[1], num_blocks[1])
        self.down2_3 = ODownsample(dim * 2)
        self.encoder_level3 = seq(dim * 4, heads[2], num_blocks[2])
        self.down3_4 = ODownsample(dim * 4)
        self.latent = seq(dim * 8, heads[3], num_blocks[3])
        self.up4_3 = OUpsample(dim * 8)
        self.reduce_chan_level3 = nn.Conv2d(dim * 8, dim * 4, 1, bias=bias)
        self.decoder_level3 = seq(dim * 4, heads[2], num_blocks[2])
        self.up3_2 = OUpsample(dim * 4)
        self.reduce_chan_level2 = nn.Conv2d(dim * 4, dim * 2, 1, bias=bias)
        self.decoder_level2 = seq(dim * 2, heads[1], num_blocks[1])
        self.up2_1 = OUpsample(dim * 2)
        self.decoder_level1 = seq(dim * 2, heads[0], num_blocks[0])
        self.refinement = seq(dim * 2, heads[0], num_refinement_blocks)
        self.output = nn.Conv2d(dim * 2, out_channels, 3, padding=1, bias=bias)

    def forward(self, x):
        e1 = self.encoder_level1(self.patch_embed.proj(x))
        e2 = self.encoder_level2(self.down1_2(e1))
        e3 = self.encoder_level3(self.down2_3(e2))
        lat = self.latent(self.down3_4(e3))
        d3 = self.decoder_level3(self.reduce_chan_level3(
            torch.cat([self.up4_3(lat), e3], 1)))
        d2 = self.decoder_level2(self.reduce_chan_level2(
            torch.cat([self.up3_2(d3), e2], 1)))
        d1 = self.decoder_level1(torch.cat([self.up2_1(d2), e1], 1))
        return self.output(self.refinement(d1)) + x


class ONAFBlock(nn.Module):
    def __init__(self, c, dw_expand=2, ffn_expand=2):
        super().__init__()
        dw = c * dw_expand
        self.conv1 = nn.Conv2d(c, dw, 1)
        self.conv2 = nn.Conv2d(dw, dw, 3, padding=1, groups=dw)
        self.conv3 = nn.Conv2d(dw // 2, c, 1)
        self.sca = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                 nn.Conv2d(dw // 2, dw // 2, 1))
        self.conv4 = nn.Conv2d(c, ffn_expand * c, 1)
        self.conv5 = nn.Conv2d(ffn_expand * c // 2, c, 1)
        self.norm1 = OLayerNorm2d(c)
        self.norm2 = OLayerNorm2d(c)
        self.beta = nn.Parameter(torch.zeros(1, c, 1, 1))
        self.gamma = nn.Parameter(torch.zeros(1, c, 1, 1))

    @staticmethod
    def _sg(x):
        a, b = x.chunk(2, dim=1)
        return a * b

    def forward(self, inp):
        x = self.norm1(inp)
        x = self.conv2(self.conv1(x))
        x = self._sg(x)
        x = x * self.sca(x)
        x = self.conv3(x)
        y = inp + x * self.beta
        x = self.conv4(self.norm2(y))
        x = self._sg(x)
        x = self.conv5(x)
        return y + x * self.gamma


class OLayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        xp = x.permute(0, 2, 3, 1)
        mu = xp.mean(-1, keepdim=True)
        var = xp.var(-1, keepdim=True, unbiased=False)
        y = (xp - mu) / torch.sqrt(var + self.eps) * self.weight + self.bias
        return y.permute(0, 3, 1, 2)


class ONAFNet(nn.Module):
    def __init__(self, img_channel=3, width=8, middle_blk_num=1,
                 enc_blk_nums=(1, 1, 1, 1), dec_blk_nums=(1, 1, 1, 1)):
        super().__init__()
        self.intro = nn.Conv2d(img_channel, width, 3, padding=1)
        self.ending = nn.Conv2d(width, img_channel, 3, padding=1)
        self.encoders = nn.ModuleList()
        self.downs = nn.ModuleList()
        self.decoders = nn.ModuleList()
        self.ups = nn.ModuleList()
        chan = width
        for n in enc_blk_nums:
            self.encoders.append(nn.Sequential(*[ONAFBlock(chan) for _ in range(n)]))
            self.downs.append(nn.Conv2d(chan, 2 * chan, 2, 2))
            chan *= 2
        self.middle_blks = nn.Sequential(*[ONAFBlock(chan) for _ in range(middle_blk_num)])
        for n in dec_blk_nums:
            self.ups.append(nn.Sequential(nn.Conv2d(chan, chan * 2, 1, bias=False),
                                          nn.PixelShuffle(2)))
            chan //= 2
            self.decoders.append(nn.Sequential(*[ONAFBlock(chan) for _ in range(n)]))

    def forward(self, x):
        inp = x
        x = self.intro(x)
        encs = []
        for enc, down in zip(self.encoders, self.downs):
            x = enc(x)
            encs.append(x)
            x = down(x)
        x = self.middle_blks(x)
        for dec, up, skip in zip(self.decoders, self.ups, encs[::-1]):
            x = up(x) + skip
            x = dec(x)
        return self.ending(x) + inp


class OMASAEncoder(nn.Module):
    def __init__(self, in_chl, nf, n_blocks=(1, 1, 1, 1), num_levels=4):
        super().__init__()
        self.num_levels = num_levels
        for lvl in range(num_levels):
            ch = nf * 2 ** lvl
            stride = 1 if lvl == 0 else 2
            in_c = in_chl if lvl == 0 else nf * 2 ** (lvl - 1)
            setattr(self, f"conv_L{lvl + 1}", nn.Conv2d(in_c, ch, 3, stride, 1))
            blocks = nn.Sequential(*[OResidualBlock(ch) for _ in range(n_blocks[min(lvl, len(n_blocks) - 1)])])
            setattr(self, f"blk_L{lvl + 1}", blocks)

    def forward(self, x):
        feats = []
        for lvl in range(self.num_levels):
            x = getattr(self, f"blk_L{lvl + 1}")(
                F.relu(getattr(self, f"conv_L{lvl + 1}")(x)))
            feats.append(x)
        return feats


class OResidualBlock(nn.Module):
    def __init__(self, nf):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, nf, 3, padding=1)
        self.conv2 = nn.Conv2d(nf, nf, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x))) + x


class ORestormerRefFusion(nn.Module):
    """Torch oracle of the guided Restormer: 4-level MASA + fusion blocks."""

    def __init__(self, inp_channels=3, dim=8, num_blocks=(1, 1, 1, 1),
                 num_refinement_blocks=1, heads=(1, 1, 2, 2), ffn_factor=2.66,
                 bias=False, ln_type="WithBias", nf=8, ext_n_blocks=(1, 1, 1, 1),
                 reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4):
        super().__init__()
        self.lr_block_size = lr_block_size
        self.masa_enc = OMASAEncoder(inp_channels, nf, ext_n_blocks, 4)

        def seq(d, h, n, fusion=False):
            return nn.Sequential(*[
                OTransformerBlock(d, h, ffn_factor, bias, ln_type, fusion)
                for _ in range(n)])

        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(inp_channels, dim, 3, padding=1, bias=bias)
        self.masa_blk_enc_level1 = seq(dim * 2, heads[0], reffusion_n_blocks[0], True)
        self.encoder_level1 = seq(dim, heads[0], num_blocks[0])
        self.down1_2 = ODownsample(dim)
        self.masa_blk_enc_level2 = seq(dim * 4, heads[1], reffusion_n_blocks[1], True)
        self.encoder_level2 = seq(dim * 2, heads[1], num_blocks[1])
        self.down2_3 = ODownsample(dim * 2)
        self.masa_blk_enc_level3 = seq(dim * 8, heads[2], reffusion_n_blocks[2], True)
        self.encoder_level3 = seq(dim * 4, heads[2], num_blocks[2])
        self.down3_4 = ODownsample(dim * 4)
        self.masa_blk_enc_level4 = seq(dim * 16, heads[3], reffusion_n_blocks[3], True)
        self.latent = seq(dim * 8, heads[3], num_blocks[3])
        self.up4_3 = OUpsample(dim * 8)
        self.reduce_chan_level3 = nn.Conv2d(dim * 8, dim * 4, 1, bias=bias)
        self.decoder_level3 = seq(dim * 4, heads[2], num_blocks[2])
        self.up3_2 = OUpsample(dim * 4)
        self.reduce_chan_level2 = nn.Conv2d(dim * 4, dim * 2, 1, bias=bias)
        self.decoder_level2 = seq(dim * 2, heads[1], num_blocks[1])
        self.up2_1 = OUpsample(dim * 2)
        self.decoder_level1 = seq(dim * 2, heads[0], num_blocks[0])
        self.refinement = seq(dim * 2, heads[0], num_refinement_blocks)
        self.output = nn.Conv2d(dim * 2, 3, 3, padding=1, bias=bias)

    def forward(self, inp, ref):
        feat_lq = self.masa_enc(inp)
        feat_ref = self.masa_enc(ref)
        # dilations that fit the haloed block (matches the JAX op's filter)
        ky = feat_lq[-1].shape[-2] // max(feat_lq[-1].shape[-2] // self.lr_block_size, 1)
        cy = (ky + 2) // 2
        dil = [d for d in (1, 2, 3) if cy - d >= 0 and cy + d < ky + 2] or [1]
        warp = masa_oracle(feat_lq[-1], feat_ref, self.lr_block_size,
                           dilations=dil)

        def fuse(x, w, blocks):
            cat = torch.cat([x, w], dim=1)
            return blocks(cat)[:, : cat.size(1) // 2]

        x = self.patch_embed.proj(inp)
        x = fuse(x, warp[0], self.masa_blk_enc_level1)
        e1 = self.encoder_level1(x)
        x = self.down1_2(e1)
        x = fuse(x, warp[1], self.masa_blk_enc_level2)
        e2 = self.encoder_level2(x)
        x = self.down2_3(e2)
        x = fuse(x, warp[2], self.masa_blk_enc_level3)
        e3 = self.encoder_level3(x)
        x = self.down3_4(e3)
        x = fuse(x, warp[3], self.masa_blk_enc_level4)
        lat = self.latent(x)
        d3 = self.decoder_level3(self.reduce_chan_level3(
            torch.cat([self.up4_3(lat), e3], 1)))
        d2 = self.decoder_level2(self.reduce_chan_level2(
            torch.cat([self.up3_2(d3), e2], 1)))
        d1 = self.decoder_level1(torch.cat([self.up2_1(d2), e1], 1))
        return self.output(self.refinement(d1)) + inp


# ---------------------------------------------------------------------------
# Tower oracles with original checkpoint naming (mapper / dino / clip-text)
# ---------------------------------------------------------------------------


class OMapper(nn.Module):
    """Reference I2T Mapper layout: per-word Sequential(Linear, LN, LeakyReLU
    x3, Linear) for CLS and mean-pooled patches."""

    def __init__(self, input_dim, output_dim, num_words, hidden=1280):
        super().__init__()
        self.num_words = num_words
        for i in range(num_words):
            for prefix in ("mapping", "mapping_patch"):
                seq = nn.Sequential(
                    nn.Linear(input_dim, hidden), nn.LayerNorm(hidden),
                    nn.LeakyReLU(),
                    nn.Linear(hidden, hidden), nn.LayerNorm(hidden),
                    nn.LeakyReLU(),
                    nn.Linear(hidden, hidden), nn.LayerNorm(hidden),
                    nn.LeakyReLU(),
                    nn.Linear(hidden, output_dim))
                setattr(self, f"{prefix}_{i}", seq)

    def forward(self, embs):
        states = []
        for i in range(self.num_words):
            h = getattr(self, f"mapping_{i}")(embs[:, :1]) + \
                getattr(self, f"mapping_patch_{i}")(embs[:, 1:]).mean(
                    dim=1, keepdim=True)
            states.append(h)
        return torch.cat(states, dim=1)


class ODinoBlock(nn.Module):
    def __init__(self, dim, heads, ffn="mlp"):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.ones(dim))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.ffn = ffn
        if ffn == "swiglufused":
            # reference swiglu_ffn.py:14-34 + the Fused hidden rounding
            hidden = (int(dim * 4 * 2 / 3) + 7) // 8 * 8
            self.mlp.w12 = nn.Linear(dim, 2 * hidden)
            self.mlp.w3 = nn.Linear(hidden, dim)
        else:
            self.mlp.fc1 = nn.Linear(dim, dim * 4)
            self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.ones(dim))
        self.heads = heads

    def _attn(self, x):
        b, n, d = x.shape
        qkv = self.attn.qkv(x).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(1, 2); k = k.transpose(1, 2); v = v.transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, n, d)
        return self.attn.proj(out)

    def _ffn(self, x):
        if self.ffn == "swiglufused":
            x1, x2 = self.mlp.w12(x).chunk(2, dim=-1)
            return self.mlp.w3(F.silu(x1) * x2)
        return self.mlp.fc2(F.gelu(self.mlp.fc1(x)))

    def forward(self, x):
        x = x + self._attn(self.norm1(x)) * self.ls1.gamma
        x = x + self._ffn(self.norm2(x)) * self.ls2.gamma
        return x


class ODino(nn.Module):
    def __init__(self, img_size=28, patch=14, dim=32, depth=2, heads=2,
                 ffn="mlp"):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        n = (img_size // patch) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList([ODinoBlock(dim, heads, ffn)
                                     for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 1:]


class OCLIPText(nn.Module):
    """HF CLIPTextModel-shaped tiny text tower (gelu act)."""

    def __init__(self, vocab=100, maxpos=16, dim=64, depth=2, heads=4):
        super().__init__()
        emb = nn.Module()
        emb.token_embedding = nn.Embedding(vocab, dim)
        emb.position_embedding = nn.Embedding(maxpos, dim)
        self.embeddings = emb
        layers = []
        for _ in range(depth):
            l = nn.Module()
            l.layer_norm1 = nn.LayerNorm(dim, eps=1e-5)
            sa = nn.Module()
            for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                setattr(sa, p, nn.Linear(dim, dim))
            l.self_attn = sa
            l.layer_norm2 = nn.LayerNorm(dim, eps=1e-5)
            mlp = nn.Module()
            mlp.fc1 = nn.Linear(dim, dim * 4)
            mlp.fc2 = nn.Linear(dim * 4, dim)
            l.mlp = mlp
            layers.append(l)
        enc = nn.Module()
        enc.layers = nn.ModuleList(layers)
        self.encoder = enc
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-5)
        self.heads = heads

    def forward(self, ids):
        b, s = ids.shape
        x = self.embeddings.token_embedding(ids) + \
            self.embeddings.position_embedding(torch.arange(s))
        for l in self.encoder.layers:
            y = l.layer_norm1(x)
            bq = l.self_attn.q_proj(y)
            bk = l.self_attn.k_proj(y)
            bv = l.self_attn.v_proj(y)
            d = bq.shape[-1]
            h = self.heads

            def sh(t):
                return t.view(b, s, h, d // h).transpose(1, 2)

            attn_out = F.scaled_dot_product_attention(
                sh(bq), sh(bk), sh(bv), is_causal=True)
            attn_out = attn_out.transpose(1, 2).reshape(b, s, d)
            x = x + l.self_attn.out_proj(attn_out)
            y = l.layer_norm2(x)
            x = x + l.mlp.fc2(F.gelu(l.mlp.fc1(y)))
        return self.final_layer_norm(x)


class ONAFNetRefFusion(nn.Module):
    """Torch oracle of the guided NAFNet: 5-level MASA + NAFResFuse blocks."""

    def __init__(self, img_channel=3, width=8, middle_blk_num=1,
                 enc_blk_nums=(1, 1, 1, 1), dec_blk_nums=(1, 1, 1, 1),
                 nf=8, ext_n_blocks=(1, 1, 1, 1),
                 reffusion_n_blocks=(1, 1, 1, 1),
                 reffusion_n_blocks_middle=1, lr_block_size=4):
        super().__init__()
        self.lr_block_size = lr_block_size
        n_levels = len(enc_blk_nums)
        self.masa_enc = OMASAEncoder(img_channel, nf, ext_n_blocks,
                                     n_levels + 1)
        self.intro = nn.Conv2d(img_channel, width, 3, padding=1)
        self.ending = nn.Conv2d(width, img_channel, 3, padding=1)
        self.encoders = nn.ModuleList()
        self.downs = nn.ModuleList()
        self.decoders = nn.ModuleList()
        self.ups = nn.ModuleList()
        self.masa_blk_enc = nn.ModuleList()
        chan = width
        for i, n in enumerate(enc_blk_nums):
            self.masa_blk_enc.append(nn.Sequential(
                *[ONAFBlock(chan * 2) for _ in range(reffusion_n_blocks[i])]))
            self.encoders.append(nn.Sequential(
                *[ONAFBlock(chan) for _ in range(n)]))
            self.downs.append(nn.Conv2d(chan, 2 * chan, 2, 2))
            chan *= 2
        # reference keeps the middle fuse in a ModuleList of one Sequential
        self.masa_blk_middle = nn.ModuleList([nn.Sequential(
            *[ONAFBlock(chan * 2) for _ in range(reffusion_n_blocks_middle)])])
        self.middle_blks = nn.Sequential(
            *[ONAFBlock(chan) for _ in range(middle_blk_num)])
        for n in dec_blk_nums:
            self.ups.append(nn.Sequential(
                nn.Conv2d(chan, chan * 2, 1, bias=False), nn.PixelShuffle(2)))
            chan //= 2
            self.decoders.append(nn.Sequential(
                *[ONAFBlock(chan) for _ in range(n)]))

    def forward(self, inp, ref):
        feat_lq = self.masa_enc(inp)
        feat_ref = self.masa_enc(ref)
        ky = feat_lq[-1].shape[-2] // max(
            feat_lq[-1].shape[-2] // self.lr_block_size, 1)
        cy = (ky + 2) // 2
        dil = [d for d in (1, 2, 3) if cy - d >= 0 and cy + d < ky + 2] or [1]
        warp = masa_oracle(feat_lq[-1], feat_ref, self.lr_block_size,
                           dilations=dil)

        def fuse(x, w, blocks):
            cat = torch.cat([x, w], dim=1)
            return blocks(cat)[:, : cat.size(1) // 2]

        x = self.intro(inp)
        encs = []
        for enc, down, fuse_blk, w in zip(self.encoders, self.downs,
                                          self.masa_blk_enc, warp):
            x = fuse(x, w, fuse_blk)
            x = enc(x)
            encs.append(x)
            x = down(x)
        x = fuse(x, warp[-1], self.masa_blk_middle[0])
        x = self.middle_blks(x)
        for dec, up, skip in zip(self.decoders, self.ups, encs[::-1]):
            x = up(x) + skip
            x = dec(x)
        return self.ending(x) + inp


# ---------------------------------------------------------------------------
# diffusers-shaped tiny VAE / UNet oracles (original checkpoint naming)
# ---------------------------------------------------------------------------


def _gnorm(ch, groups=32, eps=1e-6):
    import math
    return nn.GroupNorm(math.gcd(groups, ch), ch, eps=eps)


class OVAEResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gnorm(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gnorm(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class OVAEAttn(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = _gnorm(ch)
        self.query = nn.Linear(ch, ch)
        self.key = nn.Linear(ch, ch)
        self.value = nn.Linear(ch, ch)
        self.proj_attn = nn.Linear(ch, ch)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.query(y), self.key(y), self.value(y)
        attn = torch.softmax(q @ k.transpose(-1, -2) / (c ** 0.5), dim=-1)
        out = self.proj_attn(attn @ v)
        return x + out.reshape(b, h, w, c).permute(0, 3, 1, 2)


class _Blocks(nn.Module):
    pass


class OVAE(nn.Module):
    def __init__(self, chs=(16, 32), layers=1, zc=4):
        super().__init__()
        enc = _Blocks()
        enc.conv_in = nn.Conv2d(3, chs[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = chs[0]
        for bi, c in enumerate(chs):
            blk = _Blocks()
            blk.resnets = nn.ModuleList(
                [OVAEResnet(cin if li == 0 else c, c) for li in range(layers)])
            if bi < len(chs) - 1:
                ds = _Blocks()
                ds.conv = nn.Conv2d(c, c, 3, stride=2)
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
            cin = c
        mid = _Blocks()
        mid.resnets = nn.ModuleList([OVAEResnet(chs[-1], chs[-1]),
                                     OVAEResnet(chs[-1], chs[-1])])
        mid.attentions = nn.ModuleList([OVAEAttn(chs[-1])])
        enc.mid_block = mid
        enc.conv_norm_out = _gnorm(chs[-1])
        enc.conv_out = nn.Conv2d(chs[-1], 2 * zc, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * zc, 2 * zc, 1)

        self.post_quant_conv = nn.Conv2d(zc, zc, 1)
        dec = _Blocks()
        dec.conv_in = nn.Conv2d(zc, chs[-1], 3, padding=1)
        midd = _Blocks()
        midd.resnets = nn.ModuleList([OVAEResnet(chs[-1], chs[-1]),
                                      OVAEResnet(chs[-1], chs[-1])])
        midd.attentions = nn.ModuleList([OVAEAttn(chs[-1])])
        dec.mid_block = midd
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(chs))
        cin = rev[0]
        for bi, c in enumerate(rev):
            blk = _Blocks()
            blk.resnets = nn.ModuleList(
                [OVAEResnet(cin if li == 0 else c, c)
                 for li in range(layers + 1)])
            if bi < len(rev) - 1:
                us = _Blocks()
                us.conv = nn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
            cin = c
        dec.conv_norm_out = _gnorm(rev[-1])
        dec.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for bi, blk in enumerate(e.down_blocks):
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "downsamplers"):
                x = F.pad(x, (0, 1, 0, 1))
                x = blk.downsamplers[0].conv(x)
        x = e.mid_block.resnets[0](x)
        x = e.mid_block.attentions[0](x)
        x = e.mid_block.resnets[1](x)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        return self.quant_conv(x)

    def decode(self, z):
        d = self.decoder
        x = d.conv_in(self.post_quant_conv(z))
        x = d.mid_block.resnets[0](x)
        x = d.mid_block.attentions[0](x)
        x = d.mid_block.resnets[1](x)
        for bi, blk in enumerate(d.up_blocks):
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "upsamplers"):
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))


class OUNetResnet(nn.Module):
    def __init__(self, cin, cout, tdim):
        super().__init__()
        self.norm1 = _gnorm(cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(tdim, cout)
        self.norm2 = _gnorm(cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, t):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(t))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class OUNetTBlock(nn.Module):
    def __init__(self, dim, ctx, head_dim):
        super().__init__()
        self.heads = dim // head_dim
        self.head_dim = head_dim
        for n in ("norm1", "norm2", "norm3"):
            setattr(self, n, nn.GroupNorm(1, dim, eps=1e-5))  # placeholder
        # LayerNorms actually (names must match: norm1/2/3 weight/bias 1-D)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        a1 = _Blocks()
        a1.to_q = nn.Linear(dim, dim, bias=False)
        a1.to_k = nn.Linear(dim, dim, bias=False)
        a1.to_v = nn.Linear(dim, dim, bias=False)
        a1.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.attn1 = a1
        a2 = _Blocks()
        a2.to_q = nn.Linear(dim, dim, bias=False)
        a2.to_k = nn.Linear(ctx, dim, bias=False)
        a2.to_v = nn.Linear(ctx, dim, bias=False)
        a2.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.attn2 = a2
        ff = _Blocks()
        g = _Blocks()
        g.proj = nn.Linear(dim, dim * 8)
        ff.net = nn.ModuleList([g, nn.Identity(), nn.Linear(dim * 4, dim)])
        self.ff = ff

    def _attn(self, a, x, ctx):
        b, n, d = x.shape
        q = a.to_q(x).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        k = a.to_k(ctx).view(b, -1, self.heads, self.head_dim).transpose(1, 2)
        v = a.to_v(ctx).view(b, -1, self.heads, self.head_dim).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, n, d)
        return a.to_out[0](out)

    def forward(self, x, ctx):
        x = x + self._attn(self.attn1, self.norm1(x), self.norm1(x))
        x = x + self._attn(self.attn2, self.norm2(x), ctx)
        y = self.ff.net[0].proj(self.norm3(x))
        a, g = y.chunk(2, dim=-1)
        x = x + self.ff.net[2](a * F.gelu(g))
        return x


class OUNetTransformer(nn.Module):
    def __init__(self, dim, ctx, head_dim):
        super().__init__()
        self.norm = _gnorm(dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList([
            OUNetTBlock(dim, ctx, head_dim)])
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        y = self.transformer_blocks[0](y, ctx)
        y = self.proj_out(y)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class OUNet(nn.Module):
    def __init__(self, chs=(32, 64), layers=1, ctx=64, head_dim=16):
        super().__init__()
        tdim = chs[0] * 4
        te = _Blocks()
        te.linear_1 = nn.Linear(chs[0], tdim)
        te.linear_2 = nn.Linear(tdim, tdim)
        self.time_embedding = te
        self.conv_in = nn.Conv2d(4, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cin = chs[0]
        for bi, c in enumerate(chs):
            blk = _Blocks()
            has_attn = bi < len(chs) - 1
            blk.resnets = nn.ModuleList(
                [OUNetResnet(cin if li == 0 else c, c, tdim)
                 for li in range(layers)])
            if has_attn:
                blk.attentions = nn.ModuleList(
                    [OUNetTransformer(c, ctx, head_dim)
                     for _ in range(layers)])
            if bi < len(chs) - 1:
                ds = _Blocks()
                ds.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)
            cin = c
        mid = _Blocks()
        mid.resnets = nn.ModuleList([OUNetResnet(chs[-1], chs[-1], tdim),
                                     OUNetResnet(chs[-1], chs[-1], tdim)])
        mid.attentions = nn.ModuleList([
            OUNetTransformer(chs[-1], ctx, head_dim)])
        self.mid_block = mid
        self.up_blocks = nn.ModuleList()
        # skip channel bookkeeping mirrors models/unet.py
        skip_chs = [chs[0]]
        for bi, c in enumerate(chs):
            skip_chs += [c] * layers
            if bi < len(chs) - 1:
                skip_chs.append(c)
        rev = list(reversed(chs))
        cin = rev[0]
        for bi, c in enumerate(rev):
            blk = _Blocks()
            has_attn = bi > 0
            blk.resnets = nn.ModuleList()
            if has_attn:
                blk.attentions = nn.ModuleList()
            for li in range(layers + 1):
                sk = skip_chs.pop()
                blk.resnets.append(OUNetResnet(cin + sk, c, tdim))
                if has_attn:
                    blk.attentions.append(
                        OUNetTransformer(c, ctx, head_dim))
                cin = c
            if bi < len(rev) - 1:
                us = _Blocks()
                us.conv = nn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)
        self.conv_norm_out = _gnorm(chs[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chs[0], 4, 3, padding=1)
        self.base_ch = chs[0]

    def forward(self, x, t, ctx):
        import math
        half = self.base_ch // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
        args = t.float()[:, None] * freqs[None]
        temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))

        x = self.conv_in(x)
        skips = [x]
        for bi, blk in enumerate(self.down_blocks):
            for li, r in enumerate(blk.resnets):
                x = r(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[li](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)
        for bi, blk in enumerate(self.up_blocks):
            for li, r in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = r(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[li](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class OTKSA(nn.Module):
    def __init__(self, dim, heads, bias=False):
        super().__init__()
        self.num_heads = heads
        self.temperature = nn.Parameter(torch.ones(heads, 1, 1))
        self.qkv = nn.Conv2d(dim, dim * 3, 1, bias=bias)
        self.qkv_dwconv = nn.Conv2d(dim * 3, dim * 3, 3, padding=1,
                                    groups=dim * 3, bias=bias)
        self.project_out = nn.Conv2d(dim, dim, 1, bias=bias)
        self.attn1 = nn.Parameter(torch.tensor([0.2]))
        self.attn2 = nn.Parameter(torch.tensor([0.2]))
        self.attn3 = nn.Parameter(torch.tensor([0.2]))
        self.attn4 = nn.Parameter(torch.tensor([0.2]))

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv_dwconv(self.qkv(x))
        q, k, v = qkv.chunk(3, dim=1)
        hd = self.num_heads
        q = q.view(b, hd, c // hd, h * w)
        k = k.view(b, hd, c // hd, h * w)
        v = v.view(b, hd, c // hd, h * w)
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        C = c // hd
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        out = 0
        for wgt, kk in ((self.attn1, C // 2), (self.attn2, C * 2 // 3),
                        (self.attn3, C * 3 // 4), (self.attn4, C * 4 // 5)):
            idx = torch.topk(attn, k=kk, dim=-1)[1]
            mask = torch.zeros_like(attn).scatter_(-1, idx, 1.0)
            a = torch.where(mask > 0, attn, torch.full_like(attn, float("-inf")))
            out = out + wgt * (a.softmax(dim=-1) @ v)
        out = out.view(b, c, h, w)
        return self.project_out(out)


class OMSFN(nn.Module):
    def __init__(self, dim, ffn_factor=2.66, bias=False):
        super().__init__()
        hidden = int(dim * ffn_factor)
        self.project_in = nn.Conv2d(dim, hidden * 2, 1, bias=bias)
        self.dwconv3x3 = nn.Conv2d(hidden * 2, hidden * 2, 3, padding=1,
                                   groups=hidden * 2, bias=bias)
        self.dwconv5x5 = nn.Conv2d(hidden * 2, hidden * 2, 5, padding=2,
                                   groups=hidden * 2, bias=bias)
        self.dwconv3x3_1 = nn.Conv2d(hidden * 2, hidden, 3, padding=1,
                                     groups=hidden, bias=bias)
        self.dwconv5x5_1 = nn.Conv2d(hidden * 2, hidden, 5, padding=2,
                                     groups=hidden, bias=bias)
        self.project_out = nn.Conv2d(hidden * 2, dim, 1, bias=bias)

    def forward(self, x):
        x = self.project_in(x)
        x1_3, x2_3 = F.relu(self.dwconv3x3(x)).chunk(2, dim=1)
        x1_5, x2_5 = F.relu(self.dwconv5x5(x)).chunk(2, dim=1)
        x1 = F.relu(self.dwconv3x3_1(torch.cat([x1_3, x1_5], dim=1)))
        x2 = F.relu(self.dwconv5x5_1(torch.cat([x2_3, x2_5], dim=1)))
        return self.project_out(torch.cat([x1, x2], dim=1))


class OSparseBlock(nn.Module):
    def __init__(self, dim, heads, ffn_factor=2.66, bias=False,
                 ln_type="WithBias"):
        super().__init__()
        self.norm1 = OLayerNorm(dim, ln_type)
        self.attn = OTKSA(dim, heads, bias)
        self.norm2 = OLayerNorm(dim, ln_type)
        self.ffn = OMSFN(dim, ffn_factor, bias)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.ffn(self.norm2(x))
        return x


class ODRSformer(nn.Module):
    """Plain DRSformer (no MEFC — the 200L/SPA variant)."""

    def __init__(self, dim=8, num_blocks=(1, 1, 1, 1), heads=(1, 1, 2, 2)):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, 3, padding=1, bias=False)

        def seq(d, h, n):
            return nn.Sequential(*[OSparseBlock(d, h) for _ in range(n)])

        self.encoder_level1 = seq(dim, heads[0], num_blocks[0])
        self.down1_2 = ODownsample(dim)
        self.encoder_level2 = seq(dim * 2, heads[1], num_blocks[1])
        self.down2_3 = ODownsample(dim * 2)
        self.encoder_level3 = seq(dim * 4, heads[2], num_blocks[2])
        self.down3_4 = ODownsample(dim * 4)
        self.latent = seq(dim * 8, heads[3], num_blocks[3])
        self.up4_3 = OUpsample(dim * 8)
        self.reduce_chan_level3 = nn.Conv2d(dim * 8, dim * 4, 1, bias=False)
        self.decoder_level3 = seq(dim * 4, heads[2], num_blocks[2])
        self.up3_2 = OUpsample(dim * 4)
        self.reduce_chan_level2 = nn.Conv2d(dim * 4, dim * 2, 1, bias=False)
        self.decoder_level2 = seq(dim * 2, heads[1], num_blocks[1])
        self.up2_1 = OUpsample(dim * 2)
        self.decoder_level1 = seq(dim * 2, heads[0], num_blocks[0])
        self.output = nn.Conv2d(dim * 2, 3, 3, padding=1, bias=False)

    def forward(self, x):
        e1 = self.encoder_level1(self.patch_embed.proj(x))
        e2 = self.encoder_level2(self.down1_2(e1))
        e3 = self.encoder_level3(self.down2_3(e2))
        lat = self.latent(self.down3_4(e3))
        d3 = self.decoder_level3(self.reduce_chan_level3(
            torch.cat([self.up4_3(lat), e3], 1)))
        d2 = self.decoder_level2(self.reduce_chan_level2(
            torch.cat([self.up3_2(d3), e2], 1)))
        d1 = self.decoder_level1(torch.cat([self.up2_1(d2), e1], 1))
        return self.output(d1) + x


class OPromptGen(nn.Module):
    def __init__(self, prompt_dim, prompt_len, prompt_size, lin_dim):
        super().__init__()
        # reference layout: (1, L, D, S, S)
        self.prompt_param = nn.Parameter(
            torch.rand(1, prompt_len, prompt_dim, prompt_size, prompt_size))
        self.linear_layer = nn.Linear(lin_dim, prompt_len)
        self.conv3x3 = nn.Conv2d(prompt_dim, prompt_dim, 3, padding=1,
                                 bias=False)

    def forward(self, x):
        b, c, h, w = x.shape
        emb = x.mean(dim=(-2, -1))
        wts = F.softmax(self.linear_layer(emb), dim=1)
        prompt = (wts[:, :, None, None, None] * self.prompt_param).sum(dim=1)
        prompt = F.interpolate(prompt, (h, w), mode="bilinear")
        return self.conv3x3(prompt)


class OPromptIR(nn.Module):
    """Tiny PromptIR with decoder prompt blocks (dim must be 48 for the
    hardcoded prompt dims, matching the reference)."""

    def __init__(self, dim=48, num_blocks=(1, 1, 1, 1),
                 num_refinement_blocks=1, heads=(1, 1, 2, 2)):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, 3, padding=1, bias=False)

        def seq(d, h, n):
            return nn.Sequential(*[
                OTransformerBlock(d, h, 2.66, False, "WithBias")
                for _ in range(n)])

        self.encoder_level1 = seq(dim, heads[0], num_blocks[0])
        self.down1_2 = ODownsample(dim)
        self.encoder_level2 = seq(dim * 2, heads[1], num_blocks[1])
        self.down2_3 = ODownsample(dim * 2)
        self.encoder_level3 = seq(dim * 4, heads[2], num_blocks[2])
        self.down3_4 = ODownsample(dim * 4)
        self.latent = seq(dim * 8, heads[3], num_blocks[3])

        self.prompt3 = OPromptGen(320, 5, 16, dim * 8)
        self.noise_level3 = OTransformerBlock(dim * 8 + 320, heads[2], 2.66,
                                              False, "WithBias")
        self.reduce_noise_level3 = nn.Conv2d(dim * 8 + 320, dim * 4, 1,
                                             bias=False)
        self.up4_3 = OUpsample(dim * 4)
        self.reduce_chan_level3 = nn.Conv2d(dim * 2 + dim * 4, dim * 4, 1,
                                            bias=False)
        self.decoder_level3 = seq(dim * 4, heads[2], num_blocks[2])

        self.prompt2 = OPromptGen(128, 5, 32, dim * 4)
        self.noise_level2 = OTransformerBlock(dim * 4 + 128, heads[2], 2.66,
                                              False, "WithBias")
        self.reduce_noise_level2 = nn.Conv2d(dim * 4 + 128, dim * 4, 1,
                                             bias=False)
        self.up3_2 = OUpsample(dim * 4)
        self.reduce_chan_level2 = nn.Conv2d(dim * 2 + dim * 2, dim * 2, 1,
                                            bias=False)
        self.decoder_level2 = seq(dim * 2, heads[1], num_blocks[1])

        self.prompt1 = OPromptGen(64, 5, 64, dim * 2)
        self.noise_level1 = OTransformerBlock(dim * 2 + 64, heads[2], 2.66,
                                              False, "WithBias")
        self.reduce_noise_level1 = nn.Conv2d(dim * 2 + 64, dim * 2, 1,
                                             bias=False)
        self.up2_1 = OUpsample(dim * 2)
        self.decoder_level1 = seq(dim * 2, heads[0], num_blocks[0])
        self.refinement = seq(dim * 2, heads[0], num_refinement_blocks)
        self.output = nn.Conv2d(dim * 2, 3, 3, padding=1, bias=False)

    def forward(self, x):
        e1 = self.encoder_level1(self.patch_embed.proj(x))
        e2 = self.encoder_level2(self.down1_2(e1))
        e3 = self.encoder_level3(self.down2_3(e2))
        lat = self.latent(self.down3_4(e3))
        lat = torch.cat([lat, self.prompt3(lat)], 1)
        lat = self.reduce_noise_level3(self.noise_level3(lat))
        d3 = self.reduce_chan_level3(torch.cat([self.up4_3(lat), e3], 1))
        d3 = self.decoder_level3(d3)
        d3 = torch.cat([d3, self.prompt2(d3)], 1)
        d3 = self.reduce_noise_level2(self.noise_level2(d3))
        d2 = self.reduce_chan_level2(torch.cat([self.up3_2(d3), e2], 1))
        d2 = self.decoder_level2(d2)
        d2 = torch.cat([d2, self.prompt1(d2)], 1)
        d2 = self.reduce_noise_level1(self.noise_level1(d2))
        d1 = self.decoder_level1(torch.cat([self.up2_1(d2), e1], 1))
        return self.output(self.refinement(d1)) + x


# ---------------------------------------------------------------------------
# SFNet block oracles (frequency-selection math)
# ---------------------------------------------------------------------------


class OBasicConvSF(nn.Module):
    def __init__(self, cin, cout, k, stride=1, relu=True, transpose=False):
        super().__init__()
        pad = k // 2
        layers = []
        if transpose:
            layers.append(nn.ConvTranspose2d(cin, cout, k, stride=stride,
                                             padding=k // 2 - 1))
        else:
            layers.append(nn.Conv2d(cin, cout, k, stride=stride, padding=pad))
        if relu:
            layers.append(nn.GELU())
        self.main = nn.Sequential(*layers)

    def forward(self, x):
        return self.main(x)


class OGap(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.fscale_d = nn.Parameter(torch.zeros(ch))
        self.fscale_h = nn.Parameter(torch.zeros(ch))

    def forward(self, x):
        x_d = x.mean(dim=(-2, -1), keepdim=True)
        x_h = (x - x_d) * (self.fscale_h[None, :, None, None] + 1.0)
        return x_d * self.fscale_d[None, :, None, None] + x_h


class OPatchAP(nn.Module):
    def __init__(self, ch, patch=2):
        super().__init__()
        self.patch_size = patch
        self.h = nn.Parameter(torch.zeros(ch * patch * patch))
        self.l = nn.Parameter(torch.zeros(ch * patch * patch))

    def forward(self, x):
        from einops import rearrange

        p = self.patch_size
        px = rearrange(x, "b c (p1 w1) (p2 w2) -> b (c p1 p2) w1 w2",
                       p1=p, p2=p)
        low = px.mean(dim=(-2, -1), keepdim=True)
        high = (px - low) * self.h[None, :, None, None]
        out = high + low * self.l[None, :, None, None]
        return rearrange(out, "b (c p1 p2) w1 w2 -> b c (p1 w1) (p2 w2)",
                         p1=p, p2=p)


class OSFconv(nn.Module):
    def __init__(self, ch):
        super().__init__()
        d = max(ch // 2, 32)
        self.fc = nn.Conv2d(ch, d, 1)
        self.fcs = nn.ModuleList([nn.Conv2d(d, ch, 1), nn.Conv2d(d, ch, 1)])
        self.out = nn.Conv2d(ch, ch, 1)

    def forward(self, low, high):
        z = self.fc((low + high).mean(dim=(-2, -1), keepdim=True))
        high_att = self.fcs[0](z)
        low_att = self.fcs[1](z)
        # reference semantics: softmax over the whole concatenated 2C
        # channel axis (sfnet_arch_utils.py:227-229), not pairwise
        att = torch.softmax(torch.cat([high_att, low_att], dim=1), dim=1)
        high_att, low_att = torch.chunk(att, 2, dim=1)
        return self.out(high * high_att + low * low_att)


class ODynamicFilter(nn.Module):
    def __init__(self, ch, k=3, group=8):
        super().__init__()
        import math

        self.kernel_size = k
        self.group = math.gcd(group, ch)
        self.conv = nn.Conv2d(ch, self.group * k * k, 1, bias=False)
        self.bn = nn.BatchNorm2d(self.group * k * k)
        self.modulate = OSFconv(ch)

    def forward(self, x):
        n, c, h, w = x.shape
        k, g = self.kernel_size, self.group
        filt = self.bn(self.conv(x.mean(dim=(-2, -1), keepdim=True)))
        filt = filt.reshape(n, 1, 1, g, k * k)
        filt = torch.softmax(filt, dim=-1)
        xp = F.pad(x, (k // 2,) * 4, mode="reflect")
        patches = F.unfold(xp, kernel_size=k)  # (n, c*k*k, h*w)
        patches = patches.reshape(n, g, c // g, k * k, h * w)
        # reorder to match the NHWC kernel application
        low = (patches * filt.reshape(n, g, 1, k * k, 1)).sum(dim=3)
        low = low.reshape(n, c, h, w)
        return self.modulate(low, x - low)


class OSFResBlock(nn.Module):
    def __init__(self, ch, use_filter=False):
        super().__init__()
        self.conv1 = OBasicConvSF(ch, ch, 3, relu=True)
        self.conv2 = OBasicConvSF(ch, ch, 3, relu=False)
        self.use_filter = use_filter
        if use_filter:
            self.dyna = ODynamicFilter(ch // 2, 3)
            self.dyna_2 = ODynamicFilter(ch // 2, 5)
        self.localap = OPatchAP(ch // 2, 2)
        self.global_ap = OGap(ch // 2)

    def forward(self, x):
        out = self.conv1(x)
        if self.use_filter:
            k3, k5 = out.chunk(2, dim=1)
            out = torch.cat([self.dyna(k3), self.dyna_2(k5)], dim=1)
        nl, loc = out.chunk(2, dim=1)
        out = torch.cat([self.global_ap(nl), self.localap(loc)], dim=1)
        return self.conv2(out) + x


class OKVAffine(nn.Module):
    """DiffIR conditioning head: Sequential(Linear(num_words*1024 -> 2*dim))
    named `kernel` (reference SimpleGate_DynamicFusion / NAFBlock kernel)."""

    def __init__(self, dim, num_words=10):
        super().__init__()
        self.kernel = nn.Sequential(
            nn.Linear(num_words * 1024, dim * 2, bias=False))

    def forward(self, k_v, c2):
        out = self.kernel(torch.flatten(k_v, start_dim=1)).view(-1, c2, 1, 1)
        return out.chunk(2, dim=1)


class ONAFBlockDynamic(nn.Module):
    def __init__(self, c, num_words=10):
        super().__init__()
        dw = c * 2
        # names match the reference: block-entry affine is `kernel`,
        # gate affines live on sg1/sg2
        self.kernel = nn.Sequential(nn.Linear(num_words * 1024, c * 2,
                                              bias=False))
        self.conv1 = nn.Conv2d(c, dw, 1)
        self.conv2 = nn.Conv2d(dw, dw, 3, padding=1, groups=dw)
        self.conv3 = nn.Conv2d(dw // 2, c, 1)
        self.sca = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                 nn.Conv2d(dw // 2, dw // 2, 1))
        self.sg1 = OKVAffine(dw, num_words)
        self.sg2 = OKVAffine(2 * c, num_words)
        self.conv4 = nn.Conv2d(c, 2 * c, 1)
        self.conv5 = nn.Conv2d(c, c, 1)
        self.norm1 = OLayerNorm2d(c)
        self.norm2 = OLayerNorm2d(c)
        self.beta = nn.Parameter(torch.zeros(1, c, 1, 1))
        self.gamma = nn.Parameter(torch.zeros(1, c, 1, 1))

    def forward(self, inp, k_v):
        b, c, h, w = inp.shape
        kv = self.kernel(torch.flatten(k_v, start_dim=1)).view(-1, c * 2, 1, 1)
        k1, k2 = kv.chunk(2, dim=1)
        x = inp * k1 + k2
        x = self.norm1(x)
        x = self.conv2(self.conv1(x))
        g1, g2 = self.sg1(k_v, x.size(1) * 2 // 2 * 2)
        x = x * g1 + g2
        a, bb = x.chunk(2, dim=1)
        x = a * bb
        x = x * self.sca(x)
        x = self.conv3(x)
        y = inp + x * self.beta
        x = self.conv4(self.norm2(y))
        g1, g2 = self.sg2(k_v, x.size(1) * 2 // 2 * 2)
        x = x * g1 + g2
        a, bb = x.chunk(2, dim=1)
        x = a * bb
        x = self.conv5(x)
        return y + x * self.gamma


class ONAFNetDynamic(nn.Module):
    def __init__(self, width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                 dec_blk_nums=(1, 1), num_words=10):
        super().__init__()
        self.intro = nn.Conv2d(3, width, 3, padding=1)
        self.ending = nn.Conv2d(width, 3, 3, padding=1)
        self.encoders = nn.ModuleList()
        self.downs = nn.ModuleList()
        self.decoders = nn.ModuleList()
        self.ups = nn.ModuleList()
        chan = width

        def dyn_layer(c, n):
            m = nn.Module()
            m.layers = nn.ModuleList(
                [ONAFBlockDynamic(c, num_words) for _ in range(n)])
            return m

        for n in enc_blk_nums:
            self.encoders.append(dyn_layer(chan, n))
            self.downs.append(nn.Conv2d(chan, 2 * chan, 2, 2))
            chan *= 2
        self.middle_blks = dyn_layer(chan, middle_blk_num)
        for n in dec_blk_nums:
            self.ups.append(nn.Sequential(
                nn.Conv2d(chan, chan * 2, 1, bias=False), nn.PixelShuffle(2)))
            chan //= 2
            self.decoders.append(dyn_layer(chan, n))

    def forward(self, x, k_v):
        inp = x
        x = self.intro(x)
        encs = []
        for enc, down in zip(self.encoders, self.downs):
            for blk in enc.layers:
                x = blk(x, k_v)
            encs.append(x)
            x = down(x)
        for blk in self.middle_blks.layers:
            x = blk(x, k_v)
        for dec, up, skip in zip(self.decoders, self.ups, encs[::-1]):
            x = up(x) + skip
            for blk in dec.layers:
                x = blk(x, k_v)
        return self.ending(x) + inp


class OEBlockResFusion(nn.Module):
    def __init__(self, ch, num_res):
        super().__init__()
        n = max(num_res, 1)
        layers = [OSFResBlock(ch, i == n - 1) for i in range(n)]
        self.layers = nn.Sequential(*layers)
        self.alpha = nn.Parameter(torch.zeros(1))

    def forward(self, cat):
        return self.layers(cat) * self.alpha + cat


class OEBlock(nn.Module):
    def __init__(self, ch, num_res):
        super().__init__()
        layers = [OSFResBlock(ch, i == num_res - 1) for i in range(num_res)]
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class OSCM(nn.Module):
    def __init__(self, p):
        super().__init__()
        import math
        self.main = nn.Sequential(
            OBasicConvSF(3, p // 4, 3, relu=True),
            OBasicConvSF(p // 4, p // 2, 1, relu=True),
            OBasicConvSF(p // 2, p // 2, 3, relu=True),
            OBasicConvSF(p // 2, p, 1, relu=False),
            nn.GroupNorm(p, p, eps=1e-5),  # InstanceNorm equivalent
        )

    def forward(self, x):
        return self.main(x)


class OFAM(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.merge = OBasicConvSF(ch * 2, ch, 3, relu=False)

    def forward(self, x1, x2):
        return self.merge(torch.cat([x1, x2], dim=1))


class OSFNetRefFusion(nn.Module):
    def __init__(self, num_res=1, base_channel=8, nf=8,
                 ext_n_blocks=(1, 1, 1), reffusion_n_blocks=(1, 1, 1),
                 lr_block_size=4):
        super().__init__()
        self.lr_block_size = lr_block_size
        bc = base_channel
        self.masa_enc = OMASAEncoder(3, nf, ext_n_blocks, 3)
        self.Encoder = nn.ModuleList([
            OEBlock(bc, num_res), OEBlock(bc * 2, num_res),
            OEBlock(bc * 4, num_res)])
        self.masa_blk_enc_level1 = OEBlockResFusion(bc * 2,
                                                    reffusion_n_blocks[0])
        self.masa_blk_enc_level2 = OEBlockResFusion(bc * 4,
                                                    reffusion_n_blocks[1])
        self.masa_blk_enc_level3 = OEBlockResFusion(bc * 8,
                                                    reffusion_n_blocks[2])
        self.feat_extract = nn.ModuleList([
            OBasicConvSF(3, bc, 3, relu=True),
            OBasicConvSF(bc, bc * 2, 3, stride=2, relu=True),
            OBasicConvSF(bc * 2, bc * 4, 3, stride=2, relu=True),
            OBasicConvSF(bc * 4, bc * 2, 4, stride=2, relu=True,
                         transpose=True),
            OBasicConvSF(bc * 2, bc, 4, stride=2, relu=True, transpose=True),
            OBasicConvSF(bc, 3, 3, relu=False)])
        self.Decoder = nn.ModuleList([
            OEBlock(bc * 4, num_res), OEBlock(bc * 2, num_res),
            OEBlock(bc, num_res)])
        self.Convs = nn.ModuleList([
            OBasicConvSF(bc * 4, bc * 2, 1, relu=True),
            OBasicConvSF(bc * 2, bc, 1, relu=True)])
        self.ConvsOut = nn.ModuleList([
            OBasicConvSF(bc * 4, 3, 3, relu=False),
            OBasicConvSF(bc * 2, 3, 3, relu=False)])
        self.FAM1 = OFAM(bc * 4)
        self.SCM1 = OSCM(bc * 4)
        self.FAM2 = OFAM(bc * 2)
        self.SCM2 = OSCM(bc * 2)

    def forward(self, x, ref):
        feat_lq = self.masa_enc(x)
        feat_ref = self.masa_enc(ref)
        ky = feat_lq[-1].shape[-2] // max(
            feat_lq[-1].shape[-2] // self.lr_block_size, 1)
        cy = (ky + 2) // 2
        dil = [d for d in (1, 2, 3) if cy - d >= 0 and cy + d < ky + 2] or [1]
        warp = masa_oracle(feat_lq[-1], feat_ref, self.lr_block_size,
                           dilations=dil)

        def fuse(z, w, blk):
            cat = torch.cat([z, w], dim=1)
            return blk(cat)[:, : cat.size(1) // 2]

        x_2 = x[:, :, ::2, ::2]  # F.interpolate(0.5) default nearest
        x_4 = x_2[:, :, ::2, ::2]
        z2 = self.SCM2(x_2)
        z4 = self.SCM1(x_4)
        outs = []
        x_ = self.feat_extract[0](x)
        x_ = fuse(x_, warp[0], self.masa_blk_enc_level1)
        res1 = self.Encoder[0](x_)
        z = self.feat_extract[1](res1)
        z = fuse(z, warp[1], self.masa_blk_enc_level2)
        z = self.FAM2(z, z2)
        res2 = self.Encoder[1](z)
        z = self.feat_extract[2](res2)
        z = fuse(z, warp[2], self.masa_blk_enc_level3)
        z = self.FAM1(z, z4)
        z = self.Encoder[2](z)
        z = self.Decoder[0](z)
        z_ = self.ConvsOut[0](z)
        z = self.feat_extract[3](z)
        outs.append(z_ + x_4)
        z = self.Convs[0](torch.cat([z, res2], dim=1))
        z = self.Decoder[1](z)
        z_ = self.ConvsOut[1](z)
        z = self.feat_extract[4](z)
        outs.append(z_ + x_2)
        z = self.Convs[1](torch.cat([z, res1], dim=1))
        z = self.Decoder[2](z)
        z = self.feat_extract[5](z)
        outs.append(z + x)
        return outs
