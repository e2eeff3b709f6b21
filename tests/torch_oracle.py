"""Full-model torch oracle for the Align3R network.

An independent PyTorch implementation of the architecture as DOCUMENTED in
SURVEY.md / the module docstrings (pre-LN ViT blocks with RoPE2D, dual
cross-attending decoders with zero-conv prior injection, DPT heads with
[0, 2l/4, 3l/4, l] hooks). Written from the spec — not copied from the
reference — purely as a numeric oracle: its state_dict uses the reference
key layout so `convert_state_dict` consumes it directly, giving an
end-to-end conversion + forward parity check at fp32.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RoPE2D(nn.Module):
    """Table-lookup RoPE2D (same semantics as the numpy oracle in
    test_rope_blocks.py)."""

    def __init__(self, base=100.0):
        super().__init__()
        self.base = base

    def rope1d(self, tok, pos1d, D):
        inv = 1.0 / (self.base ** (torch.arange(0, D, 2).float() / D))
        t = torch.arange(int(pos1d.max()) + 1).float()
        freqs = torch.cat([torch.outer(t, inv)] * 2, dim=-1)
        cos = freqs.cos()[pos1d][:, None]
        sin = freqs.sin()[pos1d][:, None]
        x1, x2 = tok[..., : D // 2], tok[..., D // 2:]
        rot = torch.cat([-x2, x1], dim=-1)
        return tok * cos + rot * sin

    def forward(self, tokens, positions):
        D = tokens.size(-1) // 2
        y, x = tokens.chunk(2, dim=-1)
        y = self.rope1d(y, positions[..., 0], D)
        x = self.rope1d(x, positions[..., 1], D)
        return torch.cat([y, x], dim=-1)


class Attention(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.rope = rope

    def forward(self, x, pos):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, k = self.rope(q, pos), self.rope(k, pos)
        a = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        a = a.softmax(-1)
        out = (a @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class CrossAttention(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.projq = nn.Linear(dim, dim, bias=True)
        self.projk = nn.Linear(dim, dim, bias=True)
        self.projv = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.rope = rope

    def forward(self, q_in, kv, qpos, kpos):
        B, Nq, C = q_in.shape
        H = self.heads

        def split(t):
            return t.reshape(B, -1, H, C // H).permute(0, 2, 1, 3)

        q = split(self.projq(q_in))
        k = split(self.projk(kv))
        v = split(self.projv(kv))
        q, k = self.rope(q, qpos), self.rope(k, kpos)
        a = (q @ k.transpose(-2, -1)) * (C // H) ** -0.5
        out = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, Nq, C)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, ratio=4.0):
        super().__init__()
        self.fc1 = nn.Linear(dim, int(dim * ratio))
        self.fc2 = nn.Linear(int(dim * ratio), dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class DecoderBlock(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads, rope)
        self.cross_attn = CrossAttention(dim, heads, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, xpos, ypos)
        return x + self.mlp(self.norm3(x)), y


class PatchEmbed(nn.Module):
    def __init__(self, in_ch, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, patch, stride=patch)
        self.patch = patch

    def forward(self, img):
        x = self.proj(img)
        B, C, h, w = x.shape
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        pos = torch.stack([ys, xs], -1).reshape(1, h * w, 2).expand(B, -1, -1)
        return x.flatten(2).transpose(1, 2), pos, (h, w)


class DPT(nn.Module):
    """Documented DPT adapter: hooks already selected by the caller."""

    def __init__(self, dims, ld=(96, 192, 384, 768), fd=256, out_ch=4):
        super().__init__()
        a1 = nn.Sequential(nn.Conv2d(dims[0], ld[0], 1),
                           nn.ConvTranspose2d(ld[0], ld[0], 4, 4))
        a2 = nn.Sequential(nn.Conv2d(dims[1], ld[1], 1),
                           nn.ConvTranspose2d(ld[1], ld[1], 2, 2))
        a3 = nn.Sequential(nn.Conv2d(dims[2], ld[2], 1))
        a4 = nn.Sequential(nn.Conv2d(dims[3], ld[3], 1),
                           nn.Conv2d(ld[3], ld[3], 3, 2, 1))
        self.act_postprocess = nn.ModuleList([a1, a2, a3, a4])
        self.scratch = nn.Module()
        for i in range(4):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(ld[i], fd, 3, 1, 1, bias=False))

        def rcu():
            m = nn.Module()
            m.conv1 = nn.Conv2d(fd, fd, 3, 1, 1)
            m.conv2 = nn.Conv2d(fd, fd, 3, 1, 1)
            return m

        for r in range(1, 5):
            blk = nn.Module()
            blk.resConfUnit1 = rcu()
            blk.resConfUnit2 = rcu()
            blk.out_conv = nn.Conv2d(fd, fd, 1)
            setattr(self.scratch, f"refinenet{r}", blk)
        self.head = nn.Sequential(
            nn.Conv2d(fd, fd // 2, 3, 1, 1), nn.Identity(),
            nn.Conv2d(fd // 2, fd // 2, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(fd // 2, out_ch, 1))

    @staticmethod
    def _rcu(m, x):
        out = F.relu(x)
        out = m.conv1(out)
        out = F.relu(out)
        return m.conv2(out) + x

    def _fuse(self, blk, x, skip=None):
        if skip is not None:
            x = x + self._rcu(blk.resConfUnit1, skip)
        x = self._rcu(blk.resConfUnit2, x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return blk.out_conv(x)

    def forward(self, hooks, grid, img_hw):
        nh, nw = grid
        ls = [h.transpose(1, 2).reshape(h.shape[0], -1, nh, nw) for h in hooks]
        ls = [self.act_postprocess[i](l) for i, l in enumerate(ls)]
        ls = [getattr(self.scratch, f"layer{i + 1}_rn")(l)
              for i, l in enumerate(ls)]
        p4 = self._fuse(self.scratch.refinenet4, ls[3])[
            :, :, : ls[2].shape[2], : ls[2].shape[3]]
        p3 = self._fuse(self.scratch.refinenet3, p4, ls[2])
        p2 = self._fuse(self.scratch.refinenet2, p3, ls[1])
        p1 = self._fuse(self.scratch.refinenet1, p2, ls[0])
        x = self.head[0](p1)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        x = F.relu(self.head[2](x))
        out = self.head[4](x)
        return out[:, :, : img_hw[0], : img_hw[1]]


class HeadWrap(nn.Module):
    def __init__(self, dims, patch):
        super().__init__()
        self.dpt = DPT(dims)


class TorchAlign3R(nn.Module):
    """Spec-faithful torch twin used as the conversion+forward oracle."""

    def __init__(self, cfg):
        super().__init__()
        rope = RoPE2D(cfg.rope_base)
        D_ENC, D_DEC = cfg.enc_embed_dim, cfg.dec_embed_dim
        self.patch_embed = PatchEmbed(3, D_ENC, cfg.patch_size)
        self.patch_embed_point_cloud = PatchEmbed(3, D_DEC, cfg.patch_size)
        self.enc_blocks = nn.ModuleList(
            [Block(D_ENC, cfg.enc_num_heads, rope) for _ in range(cfg.enc_depth)])
        self.enc_norm = nn.LayerNorm(D_ENC, eps=1e-6)
        self.decoder_embed = nn.Linear(D_ENC, D_DEC)
        self.dec_blocks = nn.ModuleList(
            [DecoderBlock(D_DEC, cfg.dec_num_heads, rope)
             for _ in range(cfg.dec_depth)])
        self.dec_blocks2 = nn.ModuleList(
            [DecoderBlock(D_DEC, cfg.dec_num_heads, rope)
             for _ in range(cfg.dec_depth)])
        self.dec_blocks_pc = nn.ModuleList(
            [Block(D_DEC, cfg.dec_num_heads, rope)
             for _ in range(cfg.n_pc_blocks)])
        self.dec_norm = nn.LayerNorm(D_DEC, eps=1e-6)
        self.zero_convs = nn.ModuleList(
            [nn.Sequential(nn.Conv1d(D_DEC, D_DEC, 1))
             for _ in range(cfg.n_zero_convs)])
        for zc in self.zero_convs:
            nn.init.normal_(zc[0].weight, std=0.02)  # non-zero: exercise path
            nn.init.normal_(zc[0].bias, std=0.02)
        dims = cfg.dpt_dim_tokens()
        self.downstream_head1 = HeadWrap(dims, cfg.patch_size)
        self.downstream_head2 = HeadWrap(dims, cfg.patch_size)
        self.cfg = cfg

    def _zc(self, i, tok):
        return self.zero_convs[i](tok.transpose(-1, -2)).transpose(-1, -2)

    def forward(self, img1, img2, pc1, pc2):
        cfg = self.cfg
        B = img1.shape[0]
        f, pos, grid = self.patch_embed(torch.cat([img1, img2], 0))
        for blk in self.enc_blocks:
            f = blk(f, pos)
        f = self.enc_norm(f)
        f1, f2 = f[:B], f[B:]
        pos1, pos2 = pos[:B], pos[B:]

        pc, pc_pos, _ = self.patch_embed_point_cloud(torch.cat([pc1, pc2], 0))

        g1 = self.decoder_embed(f1) + self._zc(0, pc[:B])
        g2 = self.decoder_embed(f2) + self._zc(0, pc[B:])
        outs1, outs2 = [f1], [f2]
        cur = pc
        for i in range(cfg.dec_depth):
            n1, _ = self.dec_blocks[i](g1, g2, pos1, pos2)
            n2, _ = self.dec_blocks2[i](g2, g1, pos2, pos1)
            if i < cfg.n_pc_blocks:
                cur = self.dec_blocks_pc[i](cur, pc_pos)
                n1 = n1 + self._zc(i + 1, cur[:B])
                n2 = n2 + self._zc(i + 1, cur[B:])
            g1, g2 = n1, n2
            outs1.append(g1)
            outs2.append(g2)
        hooks = self.cfg.dpt_hooks()

        def sel(outs):
            hs = [outs[h] for h in hooks]
            hs[-1] = self.dec_norm(hs[-1])
            return hs

        H, W = img1.shape[2:]
        r1 = self.downstream_head1.dpt(sel(outs1), grid, (H, W))
        r2 = self.downstream_head2.dpt(sel(outs2), grid, (H, W))
        return r1, r2
