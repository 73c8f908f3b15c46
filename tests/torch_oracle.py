"""Torch reference implementation of the VITS inference graph (test oracle).

Written from the VITS paper (arXiv 2106.06103) and the architecture
declared by voice configs, using torch's native conventions
([B, C, T] activations, torch conv layouts, module names matching the
canonical VITS layout: enc_p / dp / flow / dec / emb_g).

Used ONLY by tests: its state_dict exercises the weight converter, and
its outputs validate the JAX implementation's numerics and layouts.
It deliberately avoids sharing any code with the JAX implementation.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn

WINDOW = 4


class LayerNormC(nn.Module):
    """LayerNorm over the channel dim of [B, C, T]."""

    def __init__(self, channels):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (x.size(-1),), self.gamma, self.beta, 1e-5)
        return x.transpose(1, -1)


class RelPosMHA(nn.Module):
    def __init__(self, channels, n_heads, window=WINDOW):
        super().__init__()
        self.n_heads = n_heads
        self.k = channels // n_heads
        self.window = window
        self.conv_q = nn.Conv1d(channels, channels, 1)
        self.conv_k = nn.Conv1d(channels, channels, 1)
        self.conv_v = nn.Conv1d(channels, channels, 1)
        self.conv_o = nn.Conv1d(channels, channels, 1)
        std = self.k**-0.5
        self.emb_rel_k = nn.Parameter(
            torch.randn(1, 2 * window + 1, self.k) * std
        )
        self.emb_rel_v = nn.Parameter(
            torch.randn(1, 2 * window + 1, self.k) * std
        )

    def _rel_emb(self, emb, length):
        pad = max(length - (self.window + 1), 0)
        start = max((self.window + 1) - length, 0)
        if pad > 0:
            emb = F.pad(emb, (0, 0, pad, pad))
        return emb[:, start : start + 2 * length - 1]

    @staticmethod
    def _rel_to_abs(x):
        b, h, l, _ = x.shape
        x = F.pad(x, (0, 1))
        x = x.view(b, h, l * 2 * l)
        x = F.pad(x, (0, l - 1))
        x = x.view(b, h, l + 1, 2 * l - 1)
        return x[:, :, :l, l - 1 :]

    @staticmethod
    def _abs_to_rel(x):
        b, h, l, _ = x.shape
        x = F.pad(x, (0, l - 1))
        x = x.view(b, h, l * (2 * l - 1))
        x = F.pad(x, (l, 0))
        x = x.view(b, h, l, 2 * l)
        return x[:, :, :, 1:]

    def forward(self, x, attn_mask):
        b, c, t = x.shape
        q = self.conv_q(x).view(b, self.n_heads, self.k, t).transpose(2, 3)
        k = self.conv_k(x).view(b, self.n_heads, self.k, t).transpose(2, 3)
        v = self.conv_v(x).view(b, self.n_heads, self.k, t).transpose(2, 3)

        q = q / math.sqrt(self.k)
        scores = torch.matmul(q, k.transpose(-2, -1))
        rel_k = self._rel_emb(self.emb_rel_k, t)
        rel_logits = torch.matmul(q, rel_k.unsqueeze(0).transpose(-2, -1))
        scores = scores + self._rel_to_abs(rel_logits)
        scores = scores.masked_fill(attn_mask == 0, -1e4)
        p = torch.softmax(scores, dim=-1)
        out = torch.matmul(p, v)
        rel_v = self._rel_emb(self.emb_rel_v, t)
        out = out + torch.matmul(self._abs_to_rel(p), rel_v.unsqueeze(0))
        out = out.transpose(2, 3).contiguous().view(b, c, t)
        return self.conv_o(out)


class FFN(nn.Module):
    def __init__(self, channels, filter_channels, kernel):
        super().__init__()
        self.conv_1 = nn.Conv1d(
            channels, filter_channels, kernel, padding=kernel // 2
        )
        self.conv_2 = nn.Conv1d(
            filter_channels, channels, kernel, padding=kernel // 2
        )

    def forward(self, x, x_mask):
        x = self.conv_1(x * x_mask)
        x = torch.relu(x)
        x = self.conv_2(x * x_mask)
        return x * x_mask


class TextEncoder(nn.Module):
    def __init__(
        self,
        n_vocab,
        inter_channels,
        hidden,
        filter_channels,
        n_heads,
        n_layers,
        kernel,
    ):
        super().__init__()
        self.hidden = hidden
        self.n_layers = n_layers
        self.emb = nn.Embedding(n_vocab, hidden)
        nn.init.normal_(self.emb.weight, 0.0, hidden**-0.5)
        self.attn_layers = nn.ModuleList(
            [RelPosMHA(hidden, n_heads) for _ in range(n_layers)]
        )
        self.norm_layers_1 = nn.ModuleList(
            [LayerNormC(hidden) for _ in range(n_layers)]
        )
        self.ffn_layers = nn.ModuleList(
            [FFN(hidden, filter_channels, kernel) for _ in range(n_layers)]
        )
        self.norm_layers_2 = nn.ModuleList(
            [LayerNormC(hidden) for _ in range(n_layers)]
        )
        self.proj = nn.Conv1d(hidden, inter_channels * 2, 1)

    def forward(self, ids, lengths):
        x = self.emb(ids) * math.sqrt(self.hidden)  # [B, T, H]
        x = x.transpose(1, 2)  # [B, H, T]
        t = ids.shape[1]
        x_mask = (
            (torch.arange(t)[None, :] < lengths[:, None])
            .float()
            .unsqueeze(1)
        )  # [B,1,T]
        attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)
        x = x * x_mask
        for i in range(self.n_layers):
            y = self.attn_layers[i](x, attn_mask)
            x = self.norm_layers_1[i](x + y)
            y = self.ffn_layers[i](x, x_mask)
            x = self.norm_layers_2[i](x + y)
        x = x * x_mask
        stats = self.proj(x) * x_mask
        m, logs = stats.chunk(2, dim=1)
        return x, m, logs, x_mask


# ---------------------------------------------------------------------------
# Spline flows
# ---------------------------------------------------------------------------


def rq_spline(
    inputs,
    un_w,
    un_h,
    un_d,
    inverse=False,
    tail_bound=5.0,
    min_bin_width=1e-3,
    min_bin_height=1e-3,
    min_derivative=1e-3,
):
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    constant = math.log(math.expm1(1 - min_derivative))
    un_d = F.pad(un_d, (1, 1), value=constant)

    x = inputs.clamp(-tail_bound, tail_bound)
    nb = un_w.shape[-1]

    widths = torch.softmax(un_w, -1)
    widths = min_bin_width + (1 - min_bin_width * nb) * widths
    cw = torch.cumsum(widths, -1)
    cw = F.pad(cw, (1, 0))
    cw = 2 * tail_bound * cw - tail_bound
    cw[..., 0] = -tail_bound
    cw[..., -1] = tail_bound
    widths = cw[..., 1:] - cw[..., :-1]

    derivs = min_derivative + F.softplus(un_d)

    heights = torch.softmax(un_h, -1)
    heights = min_bin_height + (1 - min_bin_height * nb) * heights
    ch = torch.cumsum(heights, -1)
    ch = F.pad(ch, (1, 0))
    ch = 2 * tail_bound * ch - tail_bound
    ch[..., 0] = -tail_bound
    ch[..., -1] = tail_bound
    heights = ch[..., 1:] - ch[..., :-1]

    edges = ch if inverse else cw
    idx = (
        torch.sum((x.unsqueeze(-1) >= edges[..., :-1]).int(), -1) - 1
    ).clamp(0, nb - 1)

    def g(a):
        return a.gather(-1, idx.unsqueeze(-1)).squeeze(-1)

    in_cw, in_w = g(cw), g(widths)
    in_ch, in_h = g(ch), g(heights)
    delta = heights / widths
    in_delta = g(delta)
    d0 = g(derivs)
    d1 = g(derivs[..., 1:])

    if inverse:
        a = (x - in_ch) * (d0 + d1 - 2 * in_delta) + in_h * (
            in_delta - d0
        )
        b = in_h * d0 - (x - in_ch) * (d0 + d1 - 2 * in_delta)
        c = -in_delta * (x - in_ch)
        disc = (b.pow(2) - 4 * a * c).clamp_min(0)
        root = (2 * c) / (-b - torch.sqrt(disc))
        out = root * in_w + in_cw
        t1m = root * (1 - root)
        denom = in_delta + (d0 + d1 - 2 * in_delta) * t1m
        dnum = in_delta.pow(2) * (
            d1 * root.pow(2) + 2 * in_delta * t1m + d0 * (1 - root).pow(2)
        )
        logdet = -(torch.log(dnum) - 2 * torch.log(denom))
    else:
        theta = (x - in_cw) / in_w
        t1m = theta * (1 - theta)
        num = in_h * (in_delta * theta.pow(2) + d0 * t1m)
        denom = in_delta + (d0 + d1 - 2 * in_delta) * t1m
        out = in_ch + num / denom
        dnum = in_delta.pow(2) * (
            d1 * theta.pow(2) + 2 * in_delta * t1m + d0 * (1 - theta).pow(2)
        )
        logdet = torch.log(dnum) - 2 * torch.log(denom)

    out = torch.where(inside, out, inputs)
    logdet = torch.where(inside, logdet, torch.zeros_like(logdet))
    return out, logdet


class DDSConv(nn.Module):
    def __init__(self, channels, kernel, n_layers):
        super().__init__()
        self.n_layers = n_layers
        self.kernel = kernel
        self.convs_sep = nn.ModuleList()
        self.convs_1x1 = nn.ModuleList()
        self.norms_1 = nn.ModuleList()
        self.norms_2 = nn.ModuleList()
        for i in range(n_layers):
            dil = kernel**i
            pad = (kernel * dil - dil) // 2
            self.convs_sep.append(
                nn.Conv1d(
                    channels,
                    channels,
                    kernel,
                    groups=channels,
                    dilation=dil,
                    padding=pad,
                )
            )
            self.convs_1x1.append(nn.Conv1d(channels, channels, 1))
            self.norms_1.append(LayerNormC(channels))
            self.norms_2.append(LayerNormC(channels))

    def forward(self, x, x_mask, g=None):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            y = self.convs_sep[i](x * x_mask)
            y = self.norms_1[i](y)
            y = F.gelu(y)
            y = self.convs_1x1[i](y)
            y = self.norms_2[i](y)
            y = F.gelu(y)
            x = x + y
        return x * x_mask


class ConvFlow(nn.Module):
    def __init__(self, in_channels, filter_channels, kernel, n_layers,
                 num_bins=10, tail_bound=5.0):
        super().__init__()
        self.half = in_channels // 2
        self.num_bins = num_bins
        self.tail_bound = tail_bound
        self.filter_channels = filter_channels
        self.pre = nn.Conv1d(self.half, filter_channels, 1)
        self.convs = DDSConv(filter_channels, kernel, n_layers)
        self.proj = nn.Conv1d(
            filter_channels, self.half * (num_bins * 3 - 1), 1
        )
        nn.init.zeros_(self.proj.weight)
        nn.init.zeros_(self.proj.bias)

    def forward(self, x, x_mask, g=None, reverse=False):
        x0, x1 = x.chunk(2, dim=1)
        h = self.pre(x0)
        h = self.convs(h, x_mask, g=g)
        h = self.proj(h) * x_mask
        b, c, t = x0.shape
        h = h.reshape(b, c, -1, t).permute(0, 1, 3, 2)
        denom = math.sqrt(self.filter_channels)
        un_w = h[..., : self.num_bins] / denom
        un_h = h[..., self.num_bins : 2 * self.num_bins] / denom
        un_d = h[..., 2 * self.num_bins :]
        x1, logabsdet = rq_spline(
            x1, un_w, un_h, un_d, inverse=reverse,
            tail_bound=self.tail_bound,
        )
        x = torch.cat([x0, x1], 1) * x_mask
        logdet = torch.sum(logabsdet * x_mask, [1, 2])
        if reverse:
            return x
        return x, logdet


class ElementwiseAffine(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.m = nn.Parameter(torch.zeros(channels, 1))
        self.logs = nn.Parameter(torch.zeros(channels, 1))

    def forward(self, x, x_mask, g=None, reverse=False):
        if not reverse:
            y = (self.m + torch.exp(self.logs) * x) * x_mask
            logdet = torch.sum(self.logs * x_mask, [1, 2])
            return y, logdet
        return (x - self.m) * torch.exp(-self.logs) * x_mask


class Flip(nn.Module):
    def forward(self, x, *args, reverse=False, **kwargs):
        x = torch.flip(x, [1])
        if reverse:
            return x
        return x, torch.zeros(x.size(0))


class StochasticDurationPredictor(nn.Module):
    def __init__(self, in_channels, filter_channels=192, kernel=3,
                 n_flows=4, gin_channels=0):
        super().__init__()
        self.pre = nn.Conv1d(in_channels, filter_channels, 1)
        self.proj = nn.Conv1d(filter_channels, filter_channels, 1)
        self.convs = DDSConv(filter_channels, kernel, 3)
        self.flows = nn.ModuleList([ElementwiseAffine(2)])
        for _ in range(n_flows):
            self.flows.append(ConvFlow(2, filter_channels, kernel, 3))
            self.flows.append(Flip())
        self.post_pre = nn.Conv1d(1, filter_channels, 1)
        self.post_proj = nn.Conv1d(filter_channels, filter_channels, 1)
        self.post_convs = DDSConv(filter_channels, kernel, 3)
        self.post_flows = nn.ModuleList([ElementwiseAffine(2)])
        for _ in range(n_flows):
            self.post_flows.append(ConvFlow(2, filter_channels, kernel, 3))
            self.post_flows.append(Flip())
        if gin_channels:
            self.cond = nn.Conv1d(gin_channels, filter_channels, 1)

    def reverse(self, x, x_mask, g=None, noise_scale=1.0, noise=None):
        x = self.pre(x.detach())
        if g is not None:
            x = x + self.cond(g.detach())
        x = self.convs(x, x_mask)
        x = self.proj(x) * x_mask
        flows = list(reversed(self.flows))
        flows = flows[:-2] + [flows[-1]]
        if noise is None:
            noise = torch.randn(x.size(0), 2, x.size(2))
        z = noise * noise_scale
        for flow in flows:
            z = flow(z, x_mask, g=x, reverse=True)
        z0, z1 = z.chunk(2, dim=1)
        return z0


class WN(nn.Module):
    def __init__(self, hidden, kernel, n_layers, gin_channels=0):
        super().__init__()
        self.hidden = hidden
        self.n_layers = n_layers
        self.in_layers = nn.ModuleList()
        self.res_skip_layers = nn.ModuleList()
        for i in range(n_layers):
            pad = (kernel - 1) // 2
            self.in_layers.append(
                nn.utils.parametrizations.weight_norm(
                    nn.Conv1d(hidden, 2 * hidden, kernel, padding=pad)
                )
            )
            out_ch = 2 * hidden if i < n_layers - 1 else hidden
            self.res_skip_layers.append(
                nn.utils.parametrizations.weight_norm(
                    nn.Conv1d(hidden, out_ch, 1)
                )
            )
        if gin_channels:
            self.cond_layer = nn.utils.parametrizations.weight_norm(
                nn.Conv1d(gin_channels, 2 * hidden * n_layers, 1)
            )

    def forward(self, x, x_mask, g=None):
        output = torch.zeros_like(x)
        if g is not None:
            g = self.cond_layer(g)
        for i in range(self.n_layers):
            x_in = self.in_layers[i](x)
            if g is not None:
                g_l = g[:, i * 2 * self.hidden : (i + 1) * 2 * self.hidden]
            else:
                g_l = torch.zeros_like(x_in)
            acts = torch.tanh(
                (x_in + g_l)[:, : self.hidden]
            ) * torch.sigmoid((x_in + g_l)[:, self.hidden :])
            res_skip = self.res_skip_layers[i](acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[:, : self.hidden]) * x_mask
                output = output + res_skip[:, self.hidden :]
            else:
                output = output + res_skip
        return output * x_mask


class ResidualCouplingLayer(nn.Module):
    def __init__(self, channels, hidden, kernel, n_layers, gin_channels=0):
        super().__init__()
        self.half = channels // 2
        self.pre = nn.Conv1d(self.half, hidden, 1)
        self.enc = WN(hidden, kernel, n_layers, gin_channels)
        self.post = nn.Conv1d(hidden, self.half, 1)
        nn.init.zeros_(self.post.weight)
        nn.init.zeros_(self.post.bias)

    def forward(self, x, x_mask, g=None, reverse=False):
        x0, x1 = x.chunk(2, dim=1)
        h = self.pre(x0) * x_mask
        h = self.enc(h, x_mask, g=g)
        m = self.post(h) * x_mask
        if not reverse:
            x1 = (m + x1) * x_mask
        else:
            x1 = (x1 - m) * x_mask
        return torch.cat([x0, x1], 1)


class ResidualCouplingBlock(nn.Module):
    def __init__(self, channels, hidden, kernel, n_layers, n_flows=4,
                 gin_channels=0):
        super().__init__()
        self.flows = nn.ModuleList()
        for _ in range(n_flows):
            self.flows.append(
                ResidualCouplingLayer(
                    channels, hidden, kernel, n_layers, gin_channels
                )
            )
            self.flows.append(Flip())

    def forward(self, x, x_mask, g=None, reverse=False):
        if not reverse:
            for flow in self.flows:
                out = flow(x, x_mask, g=g, reverse=False)
                x = out[0] if isinstance(out, tuple) else out
        else:
            for flow in reversed(self.flows):
                x = flow(x, x_mask, g=g, reverse=True)
        return x


class ResBlock1(nn.Module):
    def __init__(self, channels, kernel, dilations):
        super().__init__()
        wn = nn.utils.parametrizations.weight_norm
        self.convs1 = nn.ModuleList(
            [
                wn(
                    nn.Conv1d(
                        channels,
                        channels,
                        kernel,
                        dilation=d,
                        padding=(kernel * d - d) // 2,
                    )
                )
                for d in dilations
            ]
        )
        self.convs2 = nn.ModuleList(
            [
                wn(
                    nn.Conv1d(
                        channels,
                        channels,
                        kernel,
                        padding=(kernel - 1) // 2,
                    )
                )
                for _ in dilations
            ]
        )
        for m in list(self.convs1) + list(self.convs2):
            nn.init.normal_(m.parametrizations.weight.original1, 0.0, 0.01)

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = F.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = F.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """HiFi-GAN ResBlock2 (upstream VITS resblock="2"): one dilated
    conv per dilation step, residual added each step."""

    def __init__(self, channels, kernel, dilations):
        super().__init__()
        wn = nn.utils.parametrizations.weight_norm
        self.convs = nn.ModuleList(
            [
                wn(
                    nn.Conv1d(
                        channels,
                        channels,
                        kernel,
                        dilation=d,
                        padding=(kernel * d - d) // 2,
                    )
                )
                for d in dilations
            ]
        )
        for m in self.convs:
            nn.init.normal_(m.parametrizations.weight.original1, 0.0, 0.01)

    def forward(self, x):
        for c in self.convs:
            xt = F.leaky_relu(x, 0.1)
            xt = c(xt)
            x = x + xt
        return x


class HiFiGAN(nn.Module):
    def __init__(
        self,
        inter_channels,
        initial_channel=512,
        rates=(8, 8, 2, 2),
        kernels=(16, 16, 4, 4),
        res_kernels=(3, 7, 11),
        res_dilations=((1, 3, 5),) * 3,
        gin_channels=0,
        resblock="1",
    ):
        super().__init__()
        wn = nn.utils.parametrizations.weight_norm
        self.num_kernels = len(res_kernels)
        self.conv_pre = nn.Conv1d(
            inter_channels, initial_channel, 7, padding=3
        )
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = initial_channel
        for u, k in zip(rates, kernels):
            self.ups.append(
                wn(
                    nn.ConvTranspose1d(
                        ch, ch // 2, k, stride=u, padding=(k - u) // 2
                    )
                )
            )
            ch //= 2
            for rk, rd in zip(res_kernels, res_dilations):
                block = ResBlock1 if resblock == "1" else ResBlock2
                self.resblocks.append(block(ch, rk, rd))
        for m in self.ups:
            nn.init.normal_(m.parametrizations.weight.original1, 0.0, 0.01)
        self.conv_post = nn.Conv1d(ch, 1, 7, padding=3, bias=False)
        if gin_channels:
            self.cond = nn.Conv1d(gin_channels, initial_channel, 1)

    def forward(self, x, g=None):
        x = self.conv_pre(x)
        if g is not None:
            x = x + self.cond(g)
        for i, up in enumerate(self.ups):
            x = F.leaky_relu(x, 0.1)
            x = up(x)
            xs = 0
            for j in range(self.num_kernels):
                xs = xs + self.resblocks[i * self.num_kernels + j](x)
            x = xs / self.num_kernels
        x = F.leaky_relu(x, 0.1)
        x = self.conv_post(x)
        return torch.tanh(x)


class DurationPredictor(nn.Module):
    """Deterministic duration predictor (use_sdp=False voices):
    conv-relu-layernorm x2 + 1x1 projection, upstream VITS layout."""

    def __init__(self, in_channels, filter_channels=256, kernel=3,
                 gin_channels=0):
        super().__init__()
        pad = kernel // 2
        self.conv_1 = nn.Conv1d(
            in_channels, filter_channels, kernel, padding=pad
        )
        self.norm_1 = LayerNormC(filter_channels)
        self.conv_2 = nn.Conv1d(
            filter_channels, filter_channels, kernel, padding=pad
        )
        self.norm_2 = LayerNormC(filter_channels)
        self.proj = nn.Conv1d(filter_channels, 1, 1)
        if gin_channels:
            self.cond = nn.Conv1d(gin_channels, in_channels, 1)

    def forward(self, x, x_mask, g=None):
        x = x.detach()
        if g is not None:
            x = x + self.cond(g.detach())
        x = self.conv_1(x * x_mask)
        x = torch.relu(x)
        x = self.norm_1(x)
        x = self.conv_2(x * x_mask)
        x = torch.relu(x)
        x = self.norm_2(x)
        x = self.proj(x * x_mask)
        return x * x_mask


class SynthesizerTrn(nn.Module):
    """Full VITS inference graph (torch oracle)."""

    def __init__(
        self,
        n_vocab,
        inter_channels=192,
        hidden=192,
        filter_channels=768,
        n_heads=2,
        n_layers=6,
        kernel=3,
        initial_channel=512,
        rates=(8, 8, 2, 2),
        up_kernels=(16, 16, 4, 4),
        n_speakers=1,
        gin_channels=0,
        resblock="1",
        res_kernels=(3, 7, 11),
        res_dilations=((1, 3, 5),) * 3,
        use_sdp=True,
    ):
        super().__init__()
        self.use_sdp = use_sdp
        self.enc_p = TextEncoder(
            n_vocab, inter_channels, hidden, filter_channels,
            n_heads, n_layers, kernel,
        )
        if use_sdp:
            self.dp = StochasticDurationPredictor(
                hidden, 192, 3, gin_channels=gin_channels
            )
        else:
            self.dp = DurationPredictor(
                hidden, 256, 3, gin_channels=gin_channels
            )
        self.flow = ResidualCouplingBlock(
            inter_channels, hidden, 5, 4, gin_channels=gin_channels
        )
        self.dec = HiFiGAN(
            inter_channels,
            initial_channel,
            rates,
            up_kernels,
            res_kernels=res_kernels,
            res_dilations=res_dilations,
            gin_channels=gin_channels,
            resblock=resblock,
        )
        if n_speakers > 1:
            self.emb_g = nn.Embedding(n_speakers, gin_channels)

    @torch.no_grad()
    def infer(
        self,
        ids,
        lengths,
        noise_scale=0.0,
        length_scale=1.0,
        noise_w=0.0,
        sid=None,
        dur_noise=None,
        prior_noise=None,
    ):
        g = None
        if sid is not None:
            g = self.emb_g(sid).unsqueeze(-1)  # [B, gin, 1]
        x, m_p, logs_p, x_mask = self.enc_p(ids, lengths)
        if self.use_sdp:
            logw = self.dp.reverse(
                x, x_mask, g=g, noise_scale=noise_w, noise=dur_noise
            )
        else:
            logw = self.dp(x, x_mask, g=g)
        w = torch.exp(logw) * x_mask * length_scale
        w_ceil = torch.ceil(w)
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
        t_y = int(y_lengths.max())
        y_mask = (
            (torch.arange(t_y)[None, :] < y_lengths[:, None])
            .float()
            .unsqueeze(1)
        )
        # build alignment by repeat_interleave per example
        b, _, t_x = ids.shape[0], None, ids.shape[1]
        m_p_f = torch.zeros(b, m_p.size(1), t_y)
        logs_p_f = torch.zeros(b, m_p.size(1), t_y)
        for bi in range(b):
            reps = w_ceil[bi, 0].long()
            idx = torch.repeat_interleave(
                torch.arange(t_x), reps
            )[:t_y]
            if idx.numel() < t_y:
                pad_n = t_y - idx.numel()
                idx = torch.cat([idx, idx.new_full((pad_n,), t_x - 1)])
            m_p_f[bi] = m_p[bi][:, idx]
            logs_p_f[bi] = logs_p[bi][:, idx]
        if prior_noise is None:
            prior_noise = torch.randn_like(m_p_f)
        else:
            prior_noise = prior_noise[:, :, :t_y]
        z_p = m_p_f + prior_noise * torch.exp(logs_p_f) * noise_scale
        z_p = z_p * y_mask
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        audio = self.dec(z * y_mask, g=g)
        return audio.squeeze(1), y_lengths, w_ceil  # y_lengths in frames


def state_dict_numpy(module: nn.Module):
    """state_dict as numpy, with parametrized weight-norm names preserved."""
    return {
        k: v.detach().cpu().numpy() for k, v in module.state_dict().items()
    }
