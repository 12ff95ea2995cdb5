"""Checkpoint converters: PyTorch RVC/HuBERT/RMVPE state dicts → JAX pytrees.

The reference consumes ``.onnx`` exports of these models
(``/root/reference/rvc/src/models.rs:48-76``); we consume the upstream torch
checkpoints directly (``.pth``/``.pt``, loaded with torch CPU) and convert to
the parameter layout of :mod:`obs_rvc_tpu.models`.

Layout transforms (documented once, applied everywhere):

- Linear:          torch ``[out, in]``        → Dense kernel ``[in, out]`` (transpose)
- Conv1d:          torch ``[out, in, k]``     → flax Conv ``[k, in, out]``
- Conv1d 1×1:      torch ``[out, in, 1]``     → Dense kernel ``[in, out]``
  (we implement VITS 1×1 convs as Dense)
- Conv2d:          torch ``[out, in, kh, kw]``→ flax Conv ``[kh, kw, in, out]``
- ConvTranspose1d: torch ``[in, out, k]``     → ``ConvTranspose1dTorch`` kernel
  ``[k, in, out]`` **spatially flipped** (see ``layers.conv_transpose_torch``)
- ConvTranspose2d: torch ``[in, out, kh, kw]``→ ``[kh, kw, in, out]`` flipped
- Embedding:       torch ``[n, d]``           → flax Embed ``embedding`` (copy)
- BatchNorm:       running stats + affine copied; eval-mode only
- weight_norm:     folded at load: ``w = g * v / ||v||`` (norm over all dims
  except dim 0, torch's default)
- torch GRU:       ``weight_ih_l0`` etc. copied verbatim (our BiGRU keeps
  torch gate layout)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy().astype(np.float32)


def fold_weight_norm(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Return the effective weight for ``prefix`` whether stored plain
    (``prefix.weight``) or weight-normed (``weight_g``/``weight_v``;
    also the parametrized ``parametrizations.weight.original{0,1}``)."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in sd:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        raise KeyError(f"no weight found for {prefix}")
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def linear(sd, prefix, bias=True) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv1x1_as_dense(sd, prefix, weight_normed=False, bias=True) -> dict:
    w = fold_weight_norm(sd, prefix) if weight_normed else _np(sd[f"{prefix}.weight"])
    out = {"kernel": w[:, :, 0].T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv1d(sd, prefix, weight_normed=False, bias=True) -> dict:
    w = fold_weight_norm(sd, prefix) if weight_normed else _np(sd[f"{prefix}.weight"])
    out = {"kernel": np.transpose(w, (2, 1, 0))}  # [out,in,k] → [k,in,out]
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv2d(sd, prefix, bias=True) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # [out,in,kh,kw]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv_transpose1d(sd, prefix, weight_normed=False, bias=True) -> dict:
    w = fold_weight_norm(sd, prefix) if weight_normed else _np(sd[f"{prefix}.weight"])
    # torch [in, out, k] → flip k → [k, in, out]
    out = {"kernel": np.transpose(w[:, :, ::-1], (2, 0, 1)).copy()}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv_transpose2d(sd, prefix, bias=True) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # [in, out, kh, kw]
    out = {"kernel": np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layer_norm(sd, prefix) -> dict:
    # VITS LayerNorm stores gamma/beta; torch nn.LayerNorm weight/bias
    if f"{prefix}.gamma" in sd:
        return {"scale": _np(sd[f"{prefix}.gamma"]), "bias": _np(sd[f"{prefix}.beta"])}
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def batch_norm(sd, prefix) -> tuple[dict, dict]:
    """(params, batch_stats) pair for flax nn.BatchNorm."""
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def embedding(sd, prefix) -> dict:
    return {"embedding": _np(sd[f"{prefix}.weight"])}


def mha_from_separate_qkv(sd, prefix, num_heads: int) -> dict:
    """fairseq self_attn (separate {q,k,v,out}_proj Linears) →
    :class:`~obs_rvc_tpu.models.contentvec.FusedSelfAttention` params.

    Fused layout: ``qkv_kernel [E, 3, H, D]`` (q/k/v stacked on axis 1,
    heads explicit for TP sharding), ``out_kernel [H, D, E]``.
    """
    qw = _np(sd[f"{prefix}.q_proj.weight"])  # [E, E] torch [out, in]
    kw = _np(sd[f"{prefix}.k_proj.weight"])
    vw = _np(sd[f"{prefix}.v_proj.weight"])
    ow = _np(sd[f"{prefix}.out_proj.weight"])
    E = qw.shape[0]
    H = num_heads
    D = E // H

    # w.T is [in, out]; out splits into (H, D)
    qkv_kernel = np.stack([w.T.reshape(E, H, D) for w in (qw, kw, vw)], axis=1)
    qkv_bias = np.stack(
        [_np(sd[f"{prefix}.{n}_proj.bias"]).reshape(H, D) for n in ("q", "k", "v")],
        axis=0,
    )
    return {
        "qkv_kernel": qkv_kernel,
        "qkv_bias": qkv_bias,
        "out_kernel": ow.T.reshape(H, D, E),
        "out_bias": _np(sd[f"{prefix}.out_proj.bias"]),
    }


# ---------------------------------------------------------------------------
# ContentVec / HuBERT
# ---------------------------------------------------------------------------


def convert_contentvec(state_dict: Mapping[str, Any], num_layers: int, num_heads: int = 12,
                       final_proj: bool = False) -> dict:
    """fairseq HuBERT/ContentVec state dict → ContentVec variables.

    Expected key families (fairseq HubertModel):
    ``feature_extractor.conv_layers.{i}.0.weight`` (+``.2.{weight,bias}``
    group norm on layer 0), ``layer_norm``, ``post_extract_proj``,
    ``encoder.pos_conv.0``, ``encoder.layer_norm``,
    ``encoder.layers.{i}.{self_attn,self_attn_layer_norm,fc1,fc2,final_layer_norm}``,
    optional ``final_proj``.
    """
    sd = dict(state_dict)
    p: dict[str, Any] = {}

    fe: dict[str, Any] = {}
    for i in range(7):
        w = _np(sd[f"feature_extractor.conv_layers.{i}.0.weight"])  # [out,in,k]
        fe[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
    # group norm after conv 0 (fairseq stores at .2 inside the layer module)
    fe["group_norm"] = {
        "scale": _np(sd["feature_extractor.conv_layers.0.2.weight"]),
        "bias": _np(sd["feature_extractor.conv_layers.0.2.bias"]),
    }
    p["feature_extractor"] = fe

    p["post_extract_ln"] = layer_norm(sd, "layer_norm")
    p["post_extract_proj"] = linear(sd, "post_extract_proj")

    pos_w = fold_weight_norm(sd, "encoder.pos_conv.0")  # [out, in/groups, k]
    p["pos_conv"] = {
        "pos_conv": {
            "kernel": np.transpose(pos_w, (2, 1, 0)),
            "bias": _np(sd["encoder.pos_conv.0.bias"]),
        }
    }
    p["encoder_ln"] = layer_norm(sd, "encoder.layer_norm")

    for i in range(num_layers):
        pre = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "attn": mha_from_separate_qkv(sd, f"{pre}.self_attn", num_heads),
            "attn_ln": layer_norm(sd, f"{pre}.self_attn_layer_norm"),
            "fc1": linear(sd, f"{pre}.fc1"),
            "fc2": linear(sd, f"{pre}.fc2"),
            "ffn_ln": layer_norm(sd, f"{pre}.final_layer_norm"),
        }

    if final_proj:
        p["final_proj"] = linear(sd, "final_proj")

    return {"params": p}


# ---------------------------------------------------------------------------
# RMVPE
# ---------------------------------------------------------------------------


def _conv_block_res(sd, prefix) -> tuple[dict, dict]:
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    params["conv1"] = conv2d(sd, f"{prefix}.conv.0", bias=False)
    params["bn1"], stats["bn1"] = batch_norm(sd, f"{prefix}.conv.1")
    params["conv2"] = conv2d(sd, f"{prefix}.conv.3", bias=False)
    params["bn2"], stats["bn2"] = batch_norm(sd, f"{prefix}.conv.4")
    if f"{prefix}.shortcut.weight" in sd:
        params["shortcut"] = conv2d(sd, f"{prefix}.shortcut")
    return params, stats


def _res_encoder_block(sd, prefix, n_blocks) -> tuple[dict, dict]:
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for j in range(n_blocks):
        params[f"block_{j}"], stats[f"block_{j}"] = _conv_block_res(sd, f"{prefix}.conv.{j}")
    return params, stats


def convert_rmvpe(state_dict: Mapping[str, Any], n_blocks: int = 4, en_de_layers: int = 5,
                  inter_layers: int = 4) -> dict:
    """RMVPE ``E2E`` torch checkpoint → RMVPE variables (params+batch_stats)."""
    sd = {k.removeprefix("model."): v for k, v in dict(state_dict).items()}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    unet_p: dict[str, Any] = {}
    unet_s: dict[str, Any] = {}
    unet_p["in_bn"], unet_s["in_bn"] = batch_norm(sd, "unet.encoder.bn")
    for i in range(en_de_layers):
        unet_p[f"encoder_{i}"], unet_s[f"encoder_{i}"] = _res_encoder_block(
            sd, f"unet.encoder.layers.{i}", n_blocks
        )
    for i in range(inter_layers):
        unet_p[f"intermediate_{i}"], unet_s[f"intermediate_{i}"] = _res_encoder_block(
            sd, f"unet.intermediate.layers.{i}", n_blocks
        )
    for i in range(en_de_layers):
        pre = f"unet.decoder.layers.{i}"
        dp: dict[str, Any] = {}
        ds: dict[str, Any] = {}
        dp["up"] = conv_transpose2d(sd, f"{pre}.conv1.0", bias=False)
        dp["bn"], ds["bn"] = batch_norm(sd, f"{pre}.conv1.1")
        for j in range(n_blocks):
            dp[f"block_{j}"], ds[f"block_{j}"] = _conv_block_res(sd, f"{pre}.conv2.{j}")
        unet_p[f"decoder_{i}"] = dp
        unet_s[f"decoder_{i}"] = ds
    params["unet"] = unet_p
    stats["unet"] = unet_s

    params["cnn"] = conv2d(sd, "cnn")

    gru: dict[str, Any] = {}
    for d, suffix in ((0, ""), (1, "_reverse")):
        gru[f"l0_d{d}_w_ih"] = _np(sd[f"fc.0.gru.weight_ih_l0{suffix}"])
        gru[f"l0_d{d}_w_hh"] = _np(sd[f"fc.0.gru.weight_hh_l0{suffix}"])
        gru[f"l0_d{d}_b_ih"] = _np(sd[f"fc.0.gru.bias_ih_l0{suffix}"])
        gru[f"l0_d{d}_b_hh"] = _np(sd[f"fc.0.gru.bias_hh_l0{suffix}"])
    params["gru"] = gru
    params["fc"] = linear(sd, "fc.1")

    return {"params": params, "batch_stats": stats}


def convert_crepe(state_dict: Mapping[str, Any]) -> dict:
    """torchcrepe ``Crepe`` checkpoint → Crepe variables (params+batch_stats).

    torchcrepe names: ``conv1..conv6`` (Conv2d, kernel [out,in,k,1]),
    ``conv{i}_BN`` (BatchNorm2d), ``classifier`` (Linear). The conv is over
    the frame/time axis only (W is singleton), so it converts to a 1-D
    kernel ``[k, in, out]``.
    """
    sd = dict(state_dict)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for i in range(1, 7):
        w = _np(sd[f"conv{i}.weight"])  # [out, in, k, 1]
        params[f"conv{i}"] = {
            "kernel": np.transpose(w[:, :, :, 0], (2, 1, 0)),
            "bias": _np(sd[f"conv{i}.bias"]),
        }
        params[f"bn{i}"], stats[f"bn{i}"] = batch_norm(sd, f"conv{i}_BN")
    params["classifier"] = linear(sd, "classifier")
    return {"params": params, "batch_stats": stats}


def export_crepe(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse of :func:`convert_crepe` (torchcrepe state-dict layout)."""
    p = variables["params"]
    s = variables["batch_stats"]
    out: dict[str, np.ndarray] = {}
    for i in range(1, 7):
        out[f"conv{i}.weight"] = np.transpose(np.asarray(p[f"conv{i}"]["kernel"]), (2, 1, 0))[
            :, :, :, None
        ]
        out[f"conv{i}.bias"] = np.asarray(p[f"conv{i}"]["bias"])
        _exp_bn(out, f"conv{i}_BN", p[f"bn{i}"], s[f"bn{i}"])
    _exp_linear(out, "classifier", p["classifier"])
    return out


def convert_fcpe(state_dict: Mapping[str, Any], n_layers: int = 6) -> dict:
    """torchfcpe ``CFNaiveMelPE`` checkpoint → Fcpe variables.

    torchfcpe names (``.pt`` payload key ``model``, prefix stripped):
    ``input_stack.{0,3}`` (Conv1d k3), ``input_stack.1`` (GroupNorm),
    ``net.encoder_layers.{i}.conformer.net.{0,2,4.conv,6}`` (LayerNorm /
    pointwise / depthwise / pointwise), ``norm`` (LayerNorm),
    ``output_proj`` (weight-normed Linear — g/v kept separate so the
    round-trip is bit-exact).
    """
    sd = dict(state_dict)
    if "model" in sd and isinstance(sd["model"], Mapping):
        sd = dict(sd["model"])
    params: dict[str, Any] = {
        "in_conv1": conv1d(sd, "input_stack.0"),
        "in_gn": layer_norm(sd, "input_stack.1"),
        "in_conv2": conv1d(sd, "input_stack.3"),
        "final_norm": layer_norm(sd, "norm"),
    }
    for i in range(n_layers):
        pre = f"net.encoder_layers.{i}.conformer.net"
        params[f"layer_{i}"] = {
            "ln": layer_norm(sd, f"{pre}.0"),
            "pw1": conv1x1_as_dense(sd, f"{pre}.2"),
            "dw": conv1d(sd, f"{pre}.4.conv"),
            "pw2": conv1x1_as_dense(sd, f"{pre}.6"),
        }
    # flax stores pointwise convs as rank-3 Conv kernels [1, in, out]
    for i in range(n_layers):
        for key in ("pw1", "pw2"):
            k = params[f"layer_{i}"][key]["kernel"]
            params[f"layer_{i}"][key]["kernel"] = k[None]
    params["output_proj"] = {
        "v": _np(sd["output_proj.weight_v"]).T,
        "g": _np(sd["output_proj.weight_g"]).reshape(-1),
        "bias": _np(sd["output_proj.bias"]),
    }
    return {"params": params}


def export_fcpe(variables: Mapping[str, Any], n_layers: int = 6) -> dict[str, np.ndarray]:
    """Inverse of :func:`convert_fcpe` (torchfcpe state-dict layout)."""
    p = variables["params"]
    out: dict[str, np.ndarray] = {}
    _exp_conv1d(out, "input_stack.0", p["in_conv1"])
    out["input_stack.1.weight"] = np.asarray(p["in_gn"]["scale"])
    out["input_stack.1.bias"] = np.asarray(p["in_gn"]["bias"])
    _exp_conv1d(out, "input_stack.3", p["in_conv2"])
    for i in range(n_layers):
        pre = f"net.encoder_layers.{i}.conformer.net"
        lp = p[f"layer_{i}"]
        out[f"{pre}.0.weight"] = np.asarray(lp["ln"]["scale"])
        out[f"{pre}.0.bias"] = np.asarray(lp["ln"]["bias"])
        _exp_conv1x1(out, f"{pre}.2", {**lp["pw1"], "kernel": np.asarray(lp["pw1"]["kernel"])[0]})
        _exp_conv1d(out, f"{pre}.4.conv", lp["dw"])
        _exp_conv1x1(out, f"{pre}.6", {**lp["pw2"], "kernel": np.asarray(lp["pw2"]["kernel"])[0]})
    out["norm.weight"] = np.asarray(p["final_norm"]["scale"])
    out["norm.bias"] = np.asarray(p["final_norm"]["bias"])
    out["output_proj.weight_v"] = np.asarray(p["output_proj"]["v"]).T
    out["output_proj.weight_g"] = np.asarray(p["output_proj"]["g"]).reshape(-1, 1)
    out["output_proj.bias"] = np.asarray(p["output_proj"]["bias"])
    return out


# ---------------------------------------------------------------------------
# RVC synthesizer
# ---------------------------------------------------------------------------


def convert_synthesizer(
    state_dict: Mapping[str, Any],
    n_layers: int = 6,
    flow_flows: int = 4,
    flow_layers: int = 3,
    n_ups: int = 4,
    n_resblock_kernels: int = 3,
) -> dict:
    """RVC ``SynthesizerTrnMs{256,768}NSFsid`` checkpoint (the small
    ``weights/*.pth`` with key ``weight``, or a raw state dict) →
    Synthesizer variables."""
    sd = dict(state_dict)
    if "weight" in sd and isinstance(sd["weight"], Mapping):
        sd = dict(sd["weight"])

    p: dict[str, Any] = {}

    # --- enc_p ---
    enc: dict[str, Any] = {}
    enc["emb_phone"] = linear(sd, "enc_p.emb_phone")
    enc["emb_pitch"] = embedding(sd, "enc_p.emb_pitch")
    for i in range(n_layers):
        a = f"enc_p.encoder.attn_layers.{i}"
        enc[f"attn_{i}"] = {
            "conv_q": conv1x1_as_dense(sd, f"{a}.conv_q"),
            "conv_k": conv1x1_as_dense(sd, f"{a}.conv_k"),
            "conv_v": conv1x1_as_dense(sd, f"{a}.conv_v"),
            "conv_o": conv1x1_as_dense(sd, f"{a}.conv_o"),
            "emb_rel_k": _np(sd[f"{a}.emb_rel_k"]),
            "emb_rel_v": _np(sd[f"{a}.emb_rel_v"]),
        }
        enc[f"norm1_{i}"] = layer_norm(sd, f"enc_p.encoder.norm_layers_1.{i}")
        enc[f"ffn_{i}"] = {
            "conv_1": conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1"),
            "conv_2": conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2"),
        }
        enc[f"norm2_{i}"] = layer_norm(sd, f"enc_p.encoder.norm_layers_2.{i}")
    enc["proj"] = conv1x1_as_dense(sd, "enc_p.proj")
    p["enc_p"] = enc

    # --- flow (torch interleaves Flip modules at odd indices) ---
    flow: dict[str, Any] = {}
    for i in range(flow_flows):
        f = f"flow.flows.{2 * i}"
        wn: dict[str, Any] = {"cond_layer": conv1x1_as_dense(sd, f"{f}.enc.cond_layer", weight_normed=True)}
        for j in range(flow_layers):
            wn[f"in_{j}"] = conv1d(sd, f"{f}.enc.in_layers.{j}", weight_normed=True)
            # res_skip is a k=1 nn.Conv in our WN (kernel [1, in, out])
            wn[f"res_skip_{j}"] = conv1d(sd, f"{f}.enc.res_skip_layers.{j}", weight_normed=True)
        flow[f"flow_{i}"] = {
            "pre": conv1x1_as_dense(sd, f"{f}.pre"),
            "post": conv1x1_as_dense(sd, f"{f}.post"),
            "enc": wn,
        }
    p["flow"] = flow

    # --- dec (GeneratorNSF) ---
    dec: dict[str, Any] = {}
    dec["conv_pre"] = conv1d(sd, "dec.conv_pre")
    dec["cond"] = conv1x1_as_dense(sd, "dec.cond")
    for i in range(n_ups):
        dec[f"ups_{i}"] = conv_transpose1d(sd, f"dec.ups.{i}", weight_normed=True)
        nk = f"dec.noise_convs.{i}"
        w = _np(sd[f"{nk}.weight"])
        if w.shape[-1] == 1:
            dec[f"noise_conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0)),
                                      "bias": _np(sd[f"{nk}.bias"])}
        else:
            dec[f"noise_conv_{i}"] = conv1d(sd, nk)
        for j in range(n_resblock_kernels):
            r = f"dec.resblocks.{i * n_resblock_kernels + j}"
            rb: dict[str, Any] = {}
            for l in range(3):
                rb[f"conv1_{l}"] = conv1d(sd, f"{r}.convs1.{l}", weight_normed=True)
                rb[f"conv2_{l}"] = conv1d(sd, f"{r}.convs2.{l}", weight_normed=True)
            dec[f"resblock_{i}_{j}"] = rb
    dec["conv_post"] = conv1d(sd, "dec.conv_post", weight_normed=False, bias=False)
    # SourceModuleHnNSF merge linear folded into sine_source? No: RVC's
    # l_linear maps (harmonic_num+1)=1 channel → 1 with tanh; with a single
    # harmonic this is an affine scale we keep as params for fidelity.
    if "dec.m_source.l_linear.weight" in sd:
        dec["source_linear"] = linear(sd, "dec.m_source.l_linear")
    p["dec"] = dec

    p["emb_g"] = embedding(sd, "emb_g")
    return {"params": p}


# ---------------------------------------------------------------------------
# export (inverse transforms) — params → torch-layout state dicts
# ---------------------------------------------------------------------------
#
# Produces plain (weight-norm-folded) torch-named tensors, so the exported
# dict loads back through the converters above bit-for-bit, can be written
# into an ONNX weights container (onnx_reader.write_onnx_weights), or be
# consumed by torch RVC tooling.


def _exp_linear(out, prefix, p):
    out[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_conv1x1(out, prefix, p):
    out[f"{prefix}.weight"] = np.asarray(p["kernel"]).T[:, :, None]
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_conv1d(out, prefix, p):
    out[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (2, 1, 0))
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_conv2d(out, prefix, p):
    out[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_conv_transpose1d(out, prefix, p):
    k = np.asarray(p["kernel"])  # [k, in, out], spatially flipped
    out[f"{prefix}.weight"] = np.transpose(k[::-1], (1, 2, 0)).copy()
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_conv_transpose2d(out, prefix, p):
    k = np.asarray(p["kernel"])  # [kh, kw, in, out], flipped
    out[f"{prefix}.weight"] = np.transpose(k[::-1, ::-1], (2, 3, 0, 1)).copy()
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_norm(out, prefix, p, vits=False):
    a, b = ("gamma", "beta") if vits else ("weight", "bias")
    out[f"{prefix}.{a}"] = np.asarray(p["scale"])
    out[f"{prefix}.{b}"] = np.asarray(p["bias"])


def _exp_bn(out, prefix, p, stats):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(stats["mean"])
    out[f"{prefix}.running_var"] = np.asarray(stats["var"])


def export_synthesizer(variables: Mapping[str, Any], config) -> dict[str, np.ndarray]:
    """Synthesizer variables → torch-layout state dict (SynthesizerTrnMsNSFsid
    naming; weight-norm folded)."""
    p = variables["params"]
    sd: dict[str, np.ndarray] = {}

    enc = p["enc_p"]
    _exp_linear(sd, "enc_p.emb_phone", enc["emb_phone"])
    sd["enc_p.emb_pitch.weight"] = np.asarray(enc["emb_pitch"]["embedding"])
    for i in range(config.n_layers):
        a = enc[f"attn_{i}"]
        for c in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _exp_conv1x1(sd, f"enc_p.encoder.attn_layers.{i}.{c}", a[c])
        sd[f"enc_p.encoder.attn_layers.{i}.emb_rel_k"] = np.asarray(a["emb_rel_k"])
        sd[f"enc_p.encoder.attn_layers.{i}.emb_rel_v"] = np.asarray(a["emb_rel_v"])
        _exp_norm(sd, f"enc_p.encoder.norm_layers_1.{i}", enc[f"norm1_{i}"], vits=True)
        _exp_conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1", enc[f"ffn_{i}"]["conv_1"])
        _exp_conv1d(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2", enc[f"ffn_{i}"]["conv_2"])
        _exp_norm(sd, f"enc_p.encoder.norm_layers_2.{i}", enc[f"norm2_{i}"], vits=True)
    _exp_conv1x1(sd, "enc_p.proj", enc["proj"])

    for fi in range(config.flow_flows):
        fl = p["flow"][f"flow_{fi}"]
        f = f"flow.flows.{2 * fi}"
        _exp_conv1x1(sd, f"{f}.pre", fl["pre"])
        _exp_conv1x1(sd, f"{f}.post", fl["post"])
        _exp_conv1x1(sd, f"{f}.enc.cond_layer", fl["enc"]["cond_layer"])
        for j in range(config.flow_layers):
            _exp_conv1d(sd, f"{f}.enc.in_layers.{j}", fl["enc"][f"in_{j}"])
            _exp_conv1d(sd, f"{f}.enc.res_skip_layers.{j}", fl["enc"][f"res_skip_{j}"])

    dec = p["dec"]
    _exp_conv1d(sd, "dec.conv_pre", dec["conv_pre"])
    _exp_conv1x1(sd, "dec.cond", dec["cond"])
    for i in range(len(config.upsample_rates)):
        _exp_conv_transpose1d(sd, f"dec.ups.{i}", dec[f"ups_{i}"])
        _exp_conv1d(sd, f"dec.noise_convs.{i}", dec[f"noise_conv_{i}"])
        for j in range(len(config.resblock_kernel_sizes)):
            rb = dec[f"resblock_{i}_{j}"]
            r = f"dec.resblocks.{i * len(config.resblock_kernel_sizes) + j}"
            for l in range(len(config.resblock_dilation_sizes[j])):
                _exp_conv1d(sd, f"{r}.convs1.{l}", rb[f"conv1_{l}"])
                _exp_conv1d(sd, f"{r}.convs2.{l}", rb[f"conv2_{l}"])
    _exp_conv1d(sd, "dec.conv_post", dec["conv_post"])
    _exp_linear(sd, "dec.m_source.l_linear", dec["source_linear"])
    sd["emb_g.weight"] = np.asarray(p["emb_g"]["embedding"])
    return sd


def export_contentvec(variables: Mapping[str, Any], num_layers: int, num_heads: int,
                      final_proj: bool = False) -> dict[str, np.ndarray]:
    """ContentVec variables → fairseq-HuBERT-layout state dict."""
    p = variables["params"]
    sd: dict[str, np.ndarray] = {}
    for i in range(7):
        k = np.asarray(p["feature_extractor"][f"conv_{i}"]["kernel"])
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = np.transpose(k, (2, 1, 0))
    sd["feature_extractor.conv_layers.0.2.weight"] = np.asarray(
        p["feature_extractor"]["group_norm"]["scale"]
    )
    sd["feature_extractor.conv_layers.0.2.bias"] = np.asarray(
        p["feature_extractor"]["group_norm"]["bias"]
    )
    _exp_norm(sd, "layer_norm", p["post_extract_ln"])
    _exp_linear(sd, "post_extract_proj", p["post_extract_proj"])
    pc = p["pos_conv"]["pos_conv"]
    sd["encoder.pos_conv.0.weight"] = np.transpose(np.asarray(pc["kernel"]), (2, 1, 0))
    sd["encoder.pos_conv.0.bias"] = np.asarray(pc["bias"])
    _exp_norm(sd, "encoder.layer_norm", p["encoder_ln"])
    for i in range(num_layers):
        lp = p[f"layer_{i}"]
        a = lp["attn"]
        E = a["out_bias"].shape[0]
        qkv_k = np.asarray(a["qkv_kernel"])  # [E, 3, H, D]
        qkv_b = np.asarray(a["qkv_bias"])    # [3, H, D]
        for s, name in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"encoder.layers.{i}.self_attn.{name}.weight"] = (
                qkv_k[:, s].reshape(E, E).T
            )
            sd[f"encoder.layers.{i}.self_attn.{name}.bias"] = qkv_b[s].reshape(E)
        sd[f"encoder.layers.{i}.self_attn.out_proj.weight"] = (
            np.asarray(a["out_kernel"]).reshape(E, E).T
        )
        sd[f"encoder.layers.{i}.self_attn.out_proj.bias"] = np.asarray(a["out_bias"])
        _exp_norm(sd, f"encoder.layers.{i}.self_attn_layer_norm", lp["attn_ln"])
        _exp_linear(sd, f"encoder.layers.{i}.fc1", lp["fc1"])
        _exp_linear(sd, f"encoder.layers.{i}.fc2", lp["fc2"])
        _exp_norm(sd, f"encoder.layers.{i}.final_layer_norm", lp["ffn_ln"])
    if final_proj:
        _exp_linear(sd, "final_proj", p["final_proj"])
    return sd


def export_rmvpe(variables: Mapping[str, Any], n_blocks: int = 4, en_de_layers: int = 5,
                 inter_layers: int = 4) -> dict[str, np.ndarray]:
    """RMVPE variables → E2E-layout state dict."""
    p = variables["params"]
    st = variables["batch_stats"]
    sd: dict[str, np.ndarray] = {}

    def exp_block(prefix, bp, bs):
        _exp_conv2d(sd, f"{prefix}.conv.0", bp["conv1"])
        _exp_bn(sd, f"{prefix}.conv.1", bp["bn1"], bs["bn1"])
        _exp_conv2d(sd, f"{prefix}.conv.3", bp["conv2"])
        _exp_bn(sd, f"{prefix}.conv.4", bp["bn2"], bs["bn2"])
        if "shortcut" in bp:
            _exp_conv2d(sd, f"{prefix}.shortcut", bp["shortcut"])

    _exp_bn(sd, "unet.encoder.bn", p["unet"]["in_bn"], st["unet"]["in_bn"])
    for i in range(en_de_layers):
        for j in range(n_blocks):
            exp_block(f"unet.encoder.layers.{i}.conv.{j}",
                      p["unet"][f"encoder_{i}"][f"block_{j}"],
                      st["unet"][f"encoder_{i}"][f"block_{j}"])
    for i in range(inter_layers):
        for j in range(n_blocks):
            exp_block(f"unet.intermediate.layers.{i}.conv.{j}",
                      p["unet"][f"intermediate_{i}"][f"block_{j}"],
                      st["unet"][f"intermediate_{i}"][f"block_{j}"])
    for i in range(en_de_layers):
        dp = p["unet"][f"decoder_{i}"]
        ds = st["unet"][f"decoder_{i}"]
        _exp_conv_transpose2d(sd, f"unet.decoder.layers.{i}.conv1.0", dp["up"])
        _exp_bn(sd, f"unet.decoder.layers.{i}.conv1.1", dp["bn"], ds["bn"])
        for j in range(n_blocks):
            exp_block(f"unet.decoder.layers.{i}.conv2.{j}", dp[f"block_{j}"], ds[f"block_{j}"])

    _exp_conv2d(sd, "cnn", p["cnn"])
    for d, s in ((0, ""), (1, "_reverse")):
        sd[f"fc.0.gru.weight_ih_l0{s}"] = np.asarray(p["gru"][f"l0_d{d}_w_ih"])
        sd[f"fc.0.gru.weight_hh_l0{s}"] = np.asarray(p["gru"][f"l0_d{d}_w_hh"])
        sd[f"fc.0.gru.bias_ih_l0{s}"] = np.asarray(p["gru"][f"l0_d{d}_b_ih"])
        sd[f"fc.0.gru.bias_hh_l0{s}"] = np.asarray(p["gru"][f"l0_d{d}_b_hh"])
    _exp_linear(sd, "fc.1", p["fc"])
    return sd


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def assert_tree_shapes_match(converted: Any, reference: Any, path: str = "") -> None:
    """Raise with a readable diff when the converted tree's leaf shapes do
    not match a model-initialized tree (use before serving)."""
    import jax

    conv_leaves = jax.tree_util.tree_leaves_with_path(converted)
    ref_map = {
        jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(reference)
    }
    errors = []
    for k, v in conv_leaves:
        ks = jax.tree_util.keystr(k)
        if ks not in ref_map:
            errors.append(f"unexpected leaf {ks} {v.shape}")
        elif tuple(ref_map[ks]) != tuple(v.shape):
            errors.append(f"shape mismatch {ks}: converted {v.shape} vs model {ref_map[ks]}")
    conv_keys = {jax.tree_util.keystr(k) for k, _ in conv_leaves}
    for ks in ref_map:
        if ks not in conv_keys:
            errors.append(f"missing leaf {ks}")
    if errors:
        raise ValueError("checkpoint conversion mismatch:\n  " + "\n  ".join(sorted(errors)))
