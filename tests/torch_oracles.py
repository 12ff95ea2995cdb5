"""Test-only PyTorch oracles for full-model parity gates.

These are independent torch implementations of the three networks, written
to the *upstream published* semantics that the reference's ONNX exports
encode (fairseq HuBERT/ContentVec encoder; RVC ``SynthesizerTrnMsNSFsid``
built on VITS attentions/modules + NSF-HiFiGAN; RMVPE ``E2E``). They are
deliberately structured module-for-module like the upstream torch code so
that (a) their state-dict key layout matches what
``obs_rvc_tpu.models.weights.export_*`` emits (load with ``strict=True``)
and (b) a wiring bug in the JAX models — attention plumbing, flow ordering,
NSF phase handling — cannot cancel out: the oracle is a different codebase
in a different framework.

Never imported by library code; pytest-only (VERDICT round-1 item 1).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ===========================================================================
# ContentVec / fairseq HuBERT encoder (inference path of extract_features)
# ===========================================================================

CONV_LAYERS = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2


class _SamePad(nn.Module):
    """fairseq SamePad: trim one trailing element for even kernels."""

    def __init__(self, kernel_size: int):
        super().__init__()
        self.remove = 1 if kernel_size % 2 == 0 else 0

    def forward(self, x):
        return x[:, :, : -self.remove] if self.remove else x


class _TransformerLayer(nn.Module):
    """Post-LN transformer encoder layer (fairseq TransformerSentenceEncoderLayer,
    layer_norm_first=False), with explicit separate q/k/v/out projections."""

    def __init__(self, dim: int, heads: int, ffn: int, gelu: str = "none"):
        super().__init__()
        self.gelu = gelu
        self.self_attn = nn.Module()
        self.self_attn.q_proj = nn.Linear(dim, dim)
        self.self_attn.k_proj = nn.Linear(dim, dim)
        self.self_attn.v_proj = nn.Linear(dim, dim)
        self.self_attn.out_proj = nn.Linear(dim, dim)
        self.self_attn_layer_norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, ffn)
        self.fc2 = nn.Linear(ffn, dim)
        self.final_layer_norm = nn.LayerNorm(dim)
        self.heads = heads
        self.head_dim = dim // heads

    def _attn(self, x):  # [B, T, C]
        B, T, C = x.shape
        H, D = self.heads, self.head_dim

        def split(t):
            return t.view(B, T, H, D).transpose(1, 2)  # [B, H, T, D]

        q = split(self.self_attn.q_proj(x)) * (D ** -0.5)
        k = split(self.self_attn.k_proj(x))
        v = split(self.self_attn.v_proj(x))
        w = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        out = (w @ v).transpose(1, 2).reshape(B, T, C)
        return self.self_attn.out_proj(out)

    def forward(self, x):
        x = self.self_attn_layer_norm(x + self._attn(x))
        h = self.fc2(F.gelu(self.fc1(x), approximate=self.gelu))
        return self.final_layer_norm(x + h)


class TorchContentVec(nn.Module):
    """fairseq HubertModel inference path: wav [B, L] → features [B, T, out]."""

    def __init__(self, num_layers: int = 12, dim: int = 768, heads: int = 12,
                 ffn: int = 3072, final_proj_dim: int | None = None,
                 gelu: str = "none"):
        super().__init__()
        fe = nn.Module()
        fe.conv_layers = nn.ModuleList()
        in_ch = 1
        for i, (ch, k, s) in enumerate(CONV_LAYERS):
            mods = [nn.Conv1d(in_ch, ch, k, stride=s, bias=False), nn.Dropout(0.0)]
            if i == 0:
                mods.append(nn.GroupNorm(ch, ch, affine=True))
            mods.append(nn.GELU(approximate=gelu))
            fe.conv_layers.append(nn.Sequential(*mods))
            in_ch = ch
        self.feature_extractor = fe
        self.layer_norm = nn.LayerNorm(512)
        self.post_extract_proj = nn.Linear(512, dim)

        enc = nn.Module()
        enc.pos_conv = nn.Sequential(
            nn.Conv1d(dim, dim, 128, padding=64, groups=16),
            _SamePad(128),
            nn.GELU(approximate=gelu),
        )
        enc.layer_norm = nn.LayerNorm(dim)
        enc.layers = nn.ModuleList(
            _TransformerLayer(dim, heads, ffn, gelu=gelu) for _ in range(num_layers)
        )
        self.encoder = enc
        self.final_proj = (
            nn.Linear(dim, final_proj_dim) if final_proj_dim is not None else None
        )

    def forward(self, wav):  # [B, L]
        x = wav[:, None, :]
        for layer in self.feature_extractor.conv_layers:
            x = layer(x)
        x = x.transpose(1, 2)  # [B, T, 512]
        x = self.layer_norm(x)
        x = self.post_extract_proj(x)
        x = x + self.encoder.pos_conv(x.transpose(1, 2)).transpose(1, 2)
        x = self.encoder.layer_norm(x)
        for layer in self.encoder.layers:
            x = layer(x)
        if self.final_proj is not None:
            x = self.final_proj(x)
        return x


# ===========================================================================
# RMVPE E2E
# ===========================================================================


class _ConvBlockRes(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(),
            nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(),
        )
        self.is_shortcut = in_ch != out_ch
        if self.is_shortcut:
            self.shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x):
        y = self.conv(x)
        return y + (self.shortcut(x) if self.is_shortcut else x)


class _ResEncoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch, pool, n_blocks):
        super().__init__()
        self.conv = nn.ModuleList(
            [_ConvBlockRes(in_ch, out_ch)]
            + [_ConvBlockRes(out_ch, out_ch) for _ in range(n_blocks - 1)]
        )
        self.pool = nn.AvgPool2d(2) if pool else None

    def forward(self, x):
        for c in self.conv:
            x = c(x)
        if self.pool is not None:
            return x, self.pool(x)  # (skip, pooled)
        return x


class _ResDecoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch, n_blocks):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.ConvTranspose2d(in_ch, out_ch, 3, stride=2, padding=1,
                               output_padding=1, bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(),
        )
        self.conv2 = nn.ModuleList(
            [_ConvBlockRes(out_ch * 2, out_ch)]
            + [_ConvBlockRes(out_ch, out_ch) for _ in range(n_blocks - 1)]
        )

    def forward(self, x, skip):
        x = self.conv1(x)
        x = torch.cat((x, skip), dim=1)
        for c in self.conv2:
            x = c(x)
        return x


class _BiGRUSeq(nn.Module):
    def __init__(self, input_size, hidden, num_layers):
        super().__init__()
        self.gru = nn.GRU(input_size, hidden, num_layers,
                          batch_first=True, bidirectional=True)

    def forward(self, x):
        return self.gru(x)[0]


class TorchRMVPE(nn.Module):
    """RMVPE ``E2E(4, 1, (2, 2))``: mel [B, 128, T] → salience [B, T, 360]."""

    def __init__(self, n_blocks=4, en_de_layers=5, inter_layers=4, en_out=16):
        super().__init__()
        unet = nn.Module()
        encoder = nn.Module()
        encoder.bn = nn.BatchNorm2d(1)
        encoder.layers = nn.ModuleList()
        in_ch, out_ch = 1, en_out
        for _ in range(en_de_layers):
            encoder.layers.append(_ResEncoderBlock(in_ch, out_ch, True, n_blocks))
            in_ch, out_ch = out_ch, out_ch * 2
        unet.encoder = encoder

        inter = nn.Module()
        inter.layers = nn.ModuleList(
            [_ResEncoderBlock(in_ch, out_ch, False, n_blocks)]
            + [_ResEncoderBlock(out_ch, out_ch, False, n_blocks)
               for _ in range(inter_layers - 1)]
        )
        unet.intermediate = inter

        decoder = nn.Module()
        decoder.layers = nn.ModuleList()
        ch = out_ch
        for _ in range(en_de_layers):
            decoder.layers.append(_ResDecoderBlock(ch, ch // 2, n_blocks))
            ch //= 2
        unet.decoder = decoder
        self.unet = unet

        self.cnn = nn.Conv2d(en_out, 3, 3, padding=1)
        self.fc = nn.Sequential(
            _BiGRUSeq(3 * 128, 256, 1), nn.Linear(512, 360), nn.Dropout(0.25), nn.Sigmoid()
        )

    def forward(self, mel):  # [B, 128, T]
        x = mel.transpose(-1, -2).unsqueeze(1)  # [B, 1, T, 128]
        x = self.unet.encoder.bn(x)
        skips = []
        for layer in self.unet.encoder.layers:
            skip, x = layer(x)
            skips.append(skip)
        for layer in self.unet.intermediate.layers:
            x = layer(x)
        for i, layer in enumerate(self.unet.decoder.layers):
            x = layer(x, skips[-1 - i])
        x = self.cnn(x)  # [B, 3, T, 128]
        x = x.transpose(1, 2).flatten(-2)  # [B, T, 384]
        return self.fc(x)


# ===========================================================================
# RVC SynthesizerTrnMsNSFsid (inference path)
# ===========================================================================


class _VitsLayerNorm(nn.Module):
    """VITS modules.LayerNorm: channel-first, gamma/beta, eps 1e-5."""

    def __init__(self, channels):
        super().__init__()
        self.channels = channels
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):  # [B, C, T]
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (self.channels,), self.gamma, self.beta, 1e-5)
        return x.transpose(1, -1)


class _RelPosMultiHeadAttention(nn.Module):
    """VITS attentions.MultiHeadAttention with window_size (self-attention)."""

    def __init__(self, channels, n_heads, window_size):
        super().__init__()
        self.n_heads = n_heads
        self.k_channels = channels // n_heads
        self.window_size = window_size
        self.conv_q = nn.Conv1d(channels, channels, 1)
        self.conv_k = nn.Conv1d(channels, channels, 1)
        self.conv_v = nn.Conv1d(channels, channels, 1)
        self.conv_o = nn.Conv1d(channels, channels, 1)
        self.emb_rel_k = nn.Parameter(
            torch.randn(1, window_size * 2 + 1, self.k_channels) * self.k_channels ** -0.5
        )
        self.emb_rel_v = nn.Parameter(
            torch.randn(1, window_size * 2 + 1, self.k_channels) * self.k_channels ** -0.5
        )

    def _get_relative_embeddings(self, emb, length):
        pad_length = max(length - (self.window_size + 1), 0)
        slice_start = max((self.window_size + 1) - length, 0)
        if pad_length > 0:
            emb = F.pad(emb, (0, 0, pad_length, pad_length))
        return emb[:, slice_start : slice_start + 2 * length - 1]

    @staticmethod
    def _relative_position_to_absolute_position(x):
        b, h, l, _ = x.size()
        x = F.pad(x, (0, 1))
        x = x.view(b, h, l * 2 * l)
        x = F.pad(x, (0, l - 1))
        x = x.view(b, h, l + 1, 2 * l - 1)
        return x[:, :, :l, l - 1 :]

    @staticmethod
    def _absolute_position_to_relative_position(x):
        b, h, l, _ = x.size()
        x = F.pad(x, (0, l - 1))
        x = x.view(b, h, l * l + l * (l - 1))
        x = F.pad(x, (l, 0))
        return x.view(b, h, l, 2 * l)[:, :, :, 1:]

    def forward(self, x):  # [B, C, T]
        q, k, v = self.conv_q(x), self.conv_k(x), self.conv_v(x)
        b, d, t = q.size()
        H, D = self.n_heads, self.k_channels

        def split(tensor):
            return tensor.view(b, H, D, t).transpose(2, 3)  # [B, H, T, D]

        query, key, value = split(q), split(k), split(v)
        scores = torch.matmul(query / math.sqrt(D), key.transpose(-2, -1))
        key_rel = self._get_relative_embeddings(self.emb_rel_k, t)
        rel_logits = torch.matmul(query / math.sqrt(D), key_rel.unsqueeze(0).transpose(-2, -1))
        scores = scores + self._relative_position_to_absolute_position(rel_logits)
        p_attn = torch.softmax(scores, dim=-1)
        output = torch.matmul(p_attn, value)
        rel_weights = self._absolute_position_to_relative_position(p_attn)
        value_rel = self._get_relative_embeddings(self.emb_rel_v, t)
        output = output + torch.matmul(rel_weights, value_rel.unsqueeze(0))
        output = output.transpose(2, 3).contiguous().view(b, d, t)
        return self.conv_o(output)


class _VitsFFN(nn.Module):
    def __init__(self, channels, filter_channels, kernel_size):
        super().__init__()
        self.conv_1 = nn.Conv1d(channels, filter_channels, kernel_size)
        self.conv_2 = nn.Conv1d(filter_channels, channels, kernel_size)
        self.k = kernel_size

    def _pad(self, x):
        if self.k == 1:
            return x
        return F.pad(x, ((self.k - 1) // 2, self.k // 2))

    def forward(self, x):
        x = self.conv_1(self._pad(x))
        x = torch.relu(x)
        return self.conv_2(self._pad(x))


class _TextEncoder(nn.Module):
    def __init__(self, feature_dim, hidden, filter_channels, heads, layers,
                 kernel_size, window, inter_channels):
        super().__init__()
        self.hidden = hidden
        self.emb_phone = nn.Linear(feature_dim, hidden)
        self.emb_pitch = nn.Embedding(256, hidden)
        enc = nn.Module()
        enc.attn_layers = nn.ModuleList(
            _RelPosMultiHeadAttention(hidden, heads, window) for _ in range(layers)
        )
        enc.norm_layers_1 = nn.ModuleList(_VitsLayerNorm(hidden) for _ in range(layers))
        enc.ffn_layers = nn.ModuleList(
            _VitsFFN(hidden, filter_channels, kernel_size) for _ in range(layers)
        )
        enc.norm_layers_2 = nn.ModuleList(_VitsLayerNorm(hidden) for _ in range(layers))
        self.encoder = enc
        self.proj = nn.Conv1d(hidden, inter_channels * 2, 1)
        self.inter_channels = inter_channels

    def forward(self, phone, pitch):  # [B, T, C], [B, T]
        x = self.emb_phone(phone) + self.emb_pitch(pitch)
        x = x * math.sqrt(self.hidden)
        x = F.leaky_relu(x, 0.1)
        x = x.transpose(1, -1)  # [B, C, T]
        for attn, n1, ffn, n2 in zip(
            self.encoder.attn_layers, self.encoder.norm_layers_1,
            self.encoder.ffn_layers, self.encoder.norm_layers_2,
        ):
            x = n1(x + attn(x))
            x = n2(x + ffn(x))
        stats = self.proj(x)
        m, logs = torch.split(stats, self.inter_channels, dim=1)
        return m, logs


class _WN(nn.Module):
    def __init__(self, hidden, kernel_size, dilation_rate, n_layers, gin):
        super().__init__()
        self.hidden = hidden
        self.n_layers = n_layers
        self.cond_layer = nn.Conv1d(gin, 2 * hidden * n_layers, 1)
        self.in_layers = nn.ModuleList()
        self.res_skip_layers = nn.ModuleList()
        for i in range(n_layers):
            dilation = dilation_rate ** i
            pad = (kernel_size * dilation - dilation) // 2
            self.in_layers.append(
                nn.Conv1d(hidden, 2 * hidden, kernel_size, dilation=dilation, padding=pad)
            )
            out_ch = 2 * hidden if i < n_layers - 1 else hidden
            self.res_skip_layers.append(nn.Conv1d(hidden, out_ch, 1))

    def forward(self, x, g):  # [B, H, T], [B, gin, 1]
        output = torch.zeros_like(x)
        g = self.cond_layer(g)
        H = self.hidden
        for i in range(self.n_layers):
            x_in = self.in_layers[i](x)
            g_l = g[:, i * 2 * H : (i + 1) * 2 * H, :]
            acts = x_in + g_l
            acts = torch.tanh(acts[:, :H]) * torch.sigmoid(acts[:, H:])
            res_skip = self.res_skip_layers[i](acts)
            if i < self.n_layers - 1:
                x = x + res_skip[:, :H]
                output = output + res_skip[:, H:]
            else:
                output = output + res_skip
        return output


class _ResidualCouplingLayer(nn.Module):
    """mean_only coupling (modules.ResidualCouplingLayer)."""

    def __init__(self, channels, hidden, kernel_size, dilation_rate, n_layers, gin):
        super().__init__()
        self.half = channels // 2
        self.pre = nn.Conv1d(self.half, hidden, 1)
        self.enc = _WN(hidden, kernel_size, dilation_rate, n_layers, gin)
        self.post = nn.Conv1d(hidden, self.half, 1)

    def forward(self, x, g, reverse):
        x0, x1 = torch.split(x, [self.half, self.half], dim=1)
        h = self.pre(x0)
        h = self.enc(h, g)
        m = self.post(h)
        x1 = x1 - m if reverse else x1 + m
        return torch.cat([x0, x1], dim=1)


class _Flip(nn.Module):
    def forward(self, x, g=None, reverse=False):
        return torch.flip(x, [1])


class _SineGen(nn.Module):
    def __init__(self, sampling_rate, sine_amp=0.1, noise_std=0.003, voiced_threshold=0.0):
        super().__init__()
        self.sampling_rate = sampling_rate
        self.sine_amp = sine_amp
        self.noise_std = noise_std
        self.voiced_threshold = voiced_threshold

    def forward(self, f0, upp, deterministic=True):
        # f0: [B, T] → sine [B, T*upp, 1]; harmonic_num=0 (RVC), so the
        # random initial phase for harmonics is identically zero.
        with torch.no_grad():
            f0 = f0[:, :, None]
            rad_values = (f0 / self.sampling_rate) % 1
            tmp_over_one = torch.cumsum(rad_values, 1) * upp
            tmp_over_one = F.interpolate(
                tmp_over_one.transpose(2, 1), scale_factor=float(upp),
                mode="linear", align_corners=True,
            ).transpose(2, 1)
            rad_values = F.interpolate(
                rad_values.transpose(2, 1), scale_factor=float(upp), mode="nearest"
            ).transpose(2, 1)
            tmp_over_one = tmp_over_one % 1
            tmp_over_one_idx = (tmp_over_one[:, 1:, :] - tmp_over_one[:, :-1, :]) < 0
            cumsum_shift = torch.zeros_like(rad_values)
            cumsum_shift[:, 1:, :] = tmp_over_one_idx * -1.0
            sine_waves = torch.sin(
                torch.cumsum(rad_values + cumsum_shift, dim=1) * 2 * math.pi
            ) * self.sine_amp
            uv = (f0 > self.voiced_threshold).float()
            uv = F.interpolate(
                uv.transpose(2, 1), scale_factor=float(upp), mode="nearest"
            ).transpose(2, 1)
            if deterministic:
                noise = torch.zeros_like(sine_waves)
            else:
                noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
                noise = noise_amp * torch.randn_like(sine_waves)
            sine_waves = sine_waves * uv + noise
        return sine_waves


class _SourceModuleHnNSF(nn.Module):
    def __init__(self, sampling_rate):
        super().__init__()
        self.l_sin_gen = _SineGen(sampling_rate)
        self.l_linear = nn.Linear(1, 1)

    def forward(self, x, upp):
        sine_wavs = self.l_sin_gen(x, upp)
        return torch.tanh(self.l_linear(sine_wavs))


class _ResBlock1(nn.Module):
    def __init__(self, channels, kernel_size, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList(
            nn.Conv1d(channels, channels, kernel_size, dilation=d,
                      padding=(kernel_size * d - d) // 2)
            for d in dilations
        )
        self.convs2 = nn.ModuleList(
            nn.Conv1d(channels, channels, kernel_size, padding=kernel_size // 2)
            for _ in dilations
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = F.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = F.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class _GeneratorNSF(nn.Module):
    def __init__(self, inter_channels, resblock_kernel_sizes, resblock_dilation_sizes,
                 upsample_rates, upsample_initial_channel, upsample_kernel_sizes,
                 gin_channels, sr):
        super().__init__()
        self.num_kernels = len(resblock_kernel_sizes)
        self.upp = 1
        for r in upsample_rates:
            self.upp *= r
        self.m_source = _SourceModuleHnNSF(sr)
        self.conv_pre = nn.Conv1d(inter_channels, upsample_initial_channel, 7, padding=3)
        self.cond = nn.Conv1d(gin_channels, upsample_initial_channel, 1)
        self.ups = nn.ModuleList()
        self.noise_convs = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
            ch = upsample_initial_channel // (2 ** (i + 1))
            self.ups.append(
                nn.ConvTranspose1d(upsample_initial_channel // (2 ** i), ch, k,
                                   stride=u, padding=(k - u) // 2)
            )
            if i + 1 < len(upsample_rates):
                stride_f0 = 1
                for r in upsample_rates[i + 1 :]:
                    stride_f0 *= r
                self.noise_convs.append(
                    nn.Conv1d(1, ch, kernel_size=stride_f0 * 2, stride=stride_f0,
                              padding=stride_f0 // 2)
                )
            else:
                self.noise_convs.append(nn.Conv1d(1, ch, kernel_size=1))
            for j, (rk, rd) in enumerate(
                zip(resblock_kernel_sizes, resblock_dilation_sizes)
            ):
                self.resblocks.append(_ResBlock1(ch, rk, rd))
        self.conv_post = nn.Conv1d(ch, 1, 7, padding=3, bias=False)

    def forward(self, x, f0, g):  # [B, C, T], [B, T], [B, gin, 1]
        har_source = self.m_source(f0, self.upp).transpose(1, 2)  # [B, 1, L]
        x = self.conv_pre(x)
        x = x + self.cond(g)
        for i in range(len(self.ups)):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            x = x + self.noise_convs[i](har_source)
            xs = None
            for j in range(self.num_kernels):
                y = self.resblocks[i * self.num_kernels + j](x)
                xs = y if xs is None else xs + y
            x = xs / self.num_kernels
        x = F.leaky_relu(x)  # NOTE: default slope 0.01 (HiFiGAN final act)
        x = self.conv_post(x)
        return torch.tanh(x)


class TorchSynthesizer(nn.Module):
    """SynthesizerTrnMsNSFsid.infer: (phone, pitch, pitchf, sid, rnd) → audio."""

    def __init__(self, feature_dim=768, inter_channels=192, hidden_channels=192,
                 filter_channels=768, n_heads=2, n_layers=6, kernel_size=3,
                 window=10, resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilation_sizes=((1, 3, 5),) * 3,
                 upsample_rates=(10, 10, 2, 2), upsample_initial_channel=512,
                 upsample_kernel_sizes=(16, 16, 4, 4), spk_embed_dim=109,
                 gin_channels=256, sr=40000, flow_flows=4, flow_layers=3,
                 flow_kernel=5):
        super().__init__()
        self.enc_p = _TextEncoder(feature_dim, hidden_channels, filter_channels,
                                  n_heads, n_layers, kernel_size, window,
                                  inter_channels)
        flow = nn.Module()
        flow.flows = nn.ModuleList()
        for _ in range(flow_flows):
            flow.flows.append(
                _ResidualCouplingLayer(inter_channels, hidden_channels, flow_kernel,
                                       1, flow_layers, gin_channels)
            )
            flow.flows.append(_Flip())
        self.flow = flow
        self.dec = _GeneratorNSF(inter_channels, resblock_kernel_sizes,
                                 resblock_dilation_sizes, upsample_rates,
                                 upsample_initial_channel, upsample_kernel_sizes,
                                 gin_channels, sr)
        self.emb_g = nn.Embedding(spk_embed_dim, gin_channels)

    def infer(self, phone, pitch, pitchf, sid, rnd):
        # phone [B, T, C]; pitch [B, T] long; pitchf [B, T]; sid [B] long;
        # rnd [B, 192, T] (the torch.randn_like draw, passed explicitly)
        g = self.emb_g(sid).unsqueeze(-1)  # [B, gin, 1]
        m_p, logs_p = self.enc_p(phone, pitch)
        z_p = m_p + torch.exp(logs_p) * rnd * 0.66666
        x = z_p
        for f in reversed(self.flow.flows):
            if isinstance(f, _Flip):
                x = f(x, reverse=True)
            else:
                x = f(x, g, reverse=True)
        return self.dec(x, pitchf, g)  # [B, 1, L]


# ===========================================================================
# CREPE (torchcrepe ``Crepe``, beyond-reference pitch algorithm)
# ===========================================================================


class TorchCrepe(nn.Module):
    """torchcrepe-style model: 6× [pad → Conv2d(k,1) → relu → BN → maxpool(2,1)]
    over ``[N, 1, 1024, 1]`` frames, flatten time-major, Linear(…, 360),
    sigmoid. State-dict layout matches ``weights.export_crepe``."""

    def __init__(self, capacity: str = "full"):
        super().__init__()
        if capacity == "full":
            in_ch = [1, 1024, 128, 128, 128, 256]
            out_ch = [1024, 128, 128, 128, 256, 512]
            self.in_features = 2048
        else:  # tiny
            in_ch = [1, 128, 16, 16, 16, 32]
            out_ch = [128, 16, 16, 16, 32, 64]
            self.in_features = 256
        kernels = [(512, 1)] + 5 * [(64, 1)]
        strides = [(4, 1)] + 5 * [(1, 1)]
        for i in range(6):
            setattr(self, f"conv{i+1}",
                    nn.Conv2d(in_ch[i], out_ch[i], kernels[i], strides[i]))
            setattr(self, f"conv{i+1}_BN",
                    nn.BatchNorm2d(out_ch[i], eps=1e-3, momentum=0.0))
        self.classifier = nn.Linear(self.in_features, 360)

    def _layer(self, x, i, padding):
        x = F.pad(x, padding)
        x = getattr(self, f"conv{i}")(x)
        x = F.relu(x)
        x = getattr(self, f"conv{i}_BN")(x)
        return F.max_pool2d(x, (2, 1), (2, 1))

    def forward(self, frames):  # [N, 1024]
        x = frames[:, None, :, None]
        x = self._layer(x, 1, (0, 0, 254, 254))
        for i in range(2, 7):
            x = self._layer(x, i, (0, 0, 31, 32))
        x = x.permute(0, 2, 1, 3).reshape(-1, self.in_features)
        return torch.sigmoid(self.classifier(x))


# ===========================================================================
# FCPE (torchfcpe ``CFNaiveMelPE``, beyond-reference pitch algorithm)
# ===========================================================================


class _Transpose(nn.Module):
    def forward(self, x):
        return x.transpose(1, 2)


class _DepthWiseConv1d(nn.Module):
    """torchfcpe's depthwise conv wrapper (state-dict key ``...conv``)."""

    def __init__(self, chan, kernel_size, padding):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv1d(chan, chan, kernel_size, groups=chan)

    def forward(self, x):
        return self.conv(F.pad(x, (self.padding, self.padding)))


class _FcpeConformerConvModule(nn.Module):
    """torchfcpe ConformerConvModule (BatchNorm-free "naive" form):
    LN → transpose → pointwise(2×inner) → GLU → depthwise(k31) → SiLU →
    pointwise → transpose. Sequential indices {0,2,4,6} carry weights,
    matching ``weights.convert_fcpe``'s key map."""

    def __init__(self, dim, expansion=2, kernel_size=31):
        super().__init__()
        inner = dim * expansion
        self.net = nn.Sequential(
            nn.LayerNorm(dim),
            _Transpose(),
            nn.Conv1d(dim, inner * 2, 1),
            nn.GLU(dim=1),
            _DepthWiseConv1d(inner, kernel_size, kernel_size // 2),
            nn.SiLU(),
            nn.Conv1d(inner, dim, 1),
            _Transpose(),
        )

    def forward(self, x):
        return self.net(x)


class _FcpeEncoderLayer(nn.Module):
    def __init__(self, dim, expansion, kernel_size):
        super().__init__()
        self.conformer = _FcpeConformerConvModule(dim, expansion, kernel_size)

    def forward(self, x):
        return x + self.conformer(x)


class _FcpeEncoder(nn.Module):
    def __init__(self, n_layers, dim, expansion, kernel_size):
        super().__init__()
        self.encoder_layers = nn.ModuleList(
            _FcpeEncoderLayer(dim, expansion, kernel_size) for _ in range(n_layers)
        )

    def forward(self, x):
        for layer in self.encoder_layers:
            x = layer(x)
        return x


class TorchFcpe(nn.Module):
    """torchfcpe ``CFNaiveMelPE`` (conv_only variant): input stack →
    conformer-naive encoder → LayerNorm → weight-normed Linear → sigmoid.
    State-dict layout matches ``weights.export_fcpe``."""

    def __init__(self, n_mels=128, hidden=512, n_layers=6, out_dims=360,
                 expansion=2, kernel_size=31):
        super().__init__()
        self.input_stack = nn.Sequential(
            nn.Conv1d(n_mels, hidden, 3, 1, 1),
            nn.GroupNorm(4, hidden),
            nn.LeakyReLU(),
            nn.Conv1d(hidden, hidden, 3, 1, 1),
        )
        self.net = _FcpeEncoder(n_layers, hidden, expansion, kernel_size)
        self.norm = nn.LayerNorm(hidden)
        self.output_proj = nn.utils.weight_norm(nn.Linear(hidden, out_dims))

    def forward(self, mel):  # [B, T, n_mels]
        x = self.input_stack(mel.transpose(-1, -2)).transpose(-1, -2)
        x = self.net(x)
        x = self.norm(x)
        return torch.sigmoid(self.output_proj(x))

    def decode_local_argmax(self, y, cent_table, threshold=0.05):
        """torchfcpe latent2cents_local_decoder: clamped 9-bin window
        around the argmax, salience-weighted cents, threshold → unvoiced."""
        conf, max_index = torch.max(y, dim=-1, keepdim=True)
        idx = torch.clamp(
            torch.arange(9, device=y.device)[None, :] + (max_index - 4), 0, y.shape[-1] - 1
        )
        ci = cent_table[idx]
        yl = torch.gather(y, -1, idx)
        cents = torch.sum(ci * yl, dim=-1) / torch.sum(yl, dim=-1)
        f0 = 10.0 * torch.pow(2.0, cents / 1200.0)
        return torch.where(conf[..., 0] > threshold, f0, torch.zeros_like(f0))
