"""High-level checkpoint loading for the pipeline.

The reference locates artifacts under its data dir (``contentvec``, ``f0``,
``cache`` + user model path — ``rvc/src/rvc.rs:46-75``); here each stage
loads from an explicit path, falling back to random init (useful for
benchmarks and tests), with converted trees shape-checked against the model
before use.
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import numpy as np

from obs_rvc_tpu.models import weights as W


def _torch_load(path: str | pathlib.Path) -> Any:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _load_state_dict(path: str | pathlib.Path) -> Any:
    """Load a weight container: torch ``.pth``/``.pt`` or ``.onnx`` (parsed
    without the onnx package — torch-exported initializer names follow the
    state-dict names, so the same converters apply)."""
    if str(path).endswith(".onnx"):
        from obs_rvc_tpu.models.onnx_reader import read_onnx_initializers

        return read_onnx_initializers(path)
    return _torch_load(path)


def load_contentvec_params(path: str | pathlib.Path, num_layers: int, final_proj: bool) -> dict:
    """fairseq ContentVec/HuBERT ``.pt`` → ContentVec variables."""
    ckpt = _load_state_dict(path)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    # fairseq prefixes with the wrapper module name sometimes
    sd = {k.removeprefix("hubert.").removeprefix("model."): v for k, v in sd.items()}
    return W.convert_contentvec(sd, num_layers=num_layers, final_proj=final_proj)


def load_rmvpe_params(path: str | pathlib.Path) -> dict:
    ckpt = _load_state_dict(path)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return W.convert_rmvpe(sd)


def load_crepe_params(path: str | pathlib.Path) -> dict:
    """torchcrepe .pth (plain state dict) → Crepe variables."""
    ckpt = _load_state_dict(path)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return W.convert_crepe(sd)


def load_fcpe_params(path: str | pathlib.Path, n_layers: int = 6) -> dict:
    """torchfcpe .pt (``model`` payload + config) → Fcpe variables."""
    ckpt = _load_state_dict(path)
    return W.convert_fcpe(ckpt, n_layers=n_layers)


def load_synthesizer_params(path: str | pathlib.Path) -> tuple[dict, dict]:
    """RVC ``.pth`` → (Synthesizer variables, metadata). Metadata includes
    ``sr`` / ``f0`` / ``version`` when the checkpoint carries them (the small
    RVC release format)."""
    ckpt = _load_state_dict(path)
    meta = {}
    sd = ckpt
    if isinstance(ckpt, dict) and "weight" in ckpt:
        sd = ckpt["weight"]
        meta = {k: v for k, v in ckpt.items() if k != "weight"}
    return W.convert_synthesizer(sd), meta


_SR_STRINGS = {"32k": 32000, "40k": 40000, "48k": 48000}


def synthesizer_config_from_meta(meta: dict):
    """Build a SynthesizerConfig from the RVC checkpoint's ``config`` list
    (the positional init args of SynthesizerTrnMs{256,768}NSFsid) + ``sr``/
    ``version`` fields, so arbitrary user models load with their trained
    geometry rather than our defaults."""
    from obs_rvc_tpu.models.synthesizer import SynthesizerConfig

    sr = meta.get("sr", 40000)
    if isinstance(sr, str):
        sr = _SR_STRINGS.get(sr, int(sr.rstrip("k")) * 1000 if sr.endswith("k") else int(sr))
    version = str(meta.get("version", "v2"))
    feature_dim = 256 if version == "v1" else 768

    cfg = meta.get("config")
    if not cfg:
        return SynthesizerConfig.for_sample_rate(sr, feature_dim=feature_dim)
    # positional layout of SynthesizerTrnMs*NSFsid.__init__
    (
        _spec_channels,
        _segment_size,
        inter_channels,
        hidden_channels,
        filter_channels,
        n_heads,
        n_layers,
        kernel_size,
        _p_dropout,
        _resblock,
        resblock_kernel_sizes,
        resblock_dilation_sizes,
        upsample_rates,
        upsample_initial_channel,
        upsample_kernel_sizes,
        spk_embed_dim,
        gin_channels,
        *rest,
    ) = cfg
    if rest:
        sr_val = rest[0]
        if isinstance(sr_val, str):
            sr = _SR_STRINGS.get(sr_val, sr)
        elif isinstance(sr_val, int):
            sr = sr_val
    return SynthesizerConfig(
        feature_dim=feature_dim,
        inter_channels=inter_channels,
        hidden_channels=hidden_channels,
        filter_channels=filter_channels,
        n_heads=n_heads,
        n_layers=n_layers,
        kernel_size=kernel_size,
        resblock_kernel_sizes=tuple(resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(d) for d in resblock_dilation_sizes),
        upsample_rates=tuple(upsample_rates),
        upsample_kernel_sizes=tuple(upsample_kernel_sizes),
        upsample_initial_channel=upsample_initial_channel,
        spk_embed_dim=spk_embed_dim,
        gin_channels=gin_channels,
        sample_rate=sr,
    )


def load_pipeline_params(
    pipeline,
    contentvec_path: Optional[str] = None,
    rmvpe_path: Optional[str] = None,
    crepe_path: Optional[str] = None,
    fcpe_path: Optional[str] = None,
    synthesizer_path: Optional[str] = None,
    index_path: Optional[str] = None,
    index_dtype=None,
    rng: Optional[jax.Array] = None,
    strict_shapes: bool = True,
) -> dict:
    """Assemble the full params pytree, converting what's provided and
    random-initializing the rest."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = pipeline.init_params(rng)

    if contentvec_path:
        conv = load_contentvec_params(
            contentvec_path,
            num_layers=pipeline.contentvec_cfg.num_layers,
            final_proj=pipeline.contentvec_cfg.final_proj,
        )
        if strict_shapes:
            W.assert_tree_shapes_match(conv, params["contentvec"])
        params["contentvec"] = conv
    if rmvpe_path:
        conv = load_rmvpe_params(rmvpe_path)
        if strict_shapes:
            W.assert_tree_shapes_match(conv, params["rmvpe"])
        params["rmvpe"] = conv
    if crepe_path:
        conv = load_crepe_params(crepe_path)
        if strict_shapes:
            W.assert_tree_shapes_match(conv, params["crepe"])
        params["crepe"] = conv
    if fcpe_path:
        conv = load_fcpe_params(fcpe_path, n_layers=pipeline.fcpe_cfg.n_layers)
        if strict_shapes:
            W.assert_tree_shapes_match(conv, params["fcpe"])
        params["fcpe"] = conv
    if synthesizer_path:
        conv, _meta = load_synthesizer_params(synthesizer_path)
        if strict_shapes:
            W.assert_tree_shapes_match(conv, params["synthesizer"])
        params["synthesizer"] = conv
    if index_path:
        from obs_rvc_tpu.retrieval import RetrievalIndex, load_index_vectors

        import numpy as _np

        dt = index_dtype if index_dtype is not None else _np.float32
        ridx = getattr(pipeline, "retrieval_index", None)
        if ridx is not None and getattr(ridx, "mode", "exact") == "ivf":
            from obs_rvc_tpu.retrieval.build import load_or_train_ivf

            # records the static slab length (lcap) on the index object
            params["index"] = ridx.make_ivf_params(
                load_or_train_ivf(index_path), dtype=dt, lcap=ridx.lcap
            )
        else:
            params["index"] = RetrievalIndex.make_params(
                load_index_vectors(index_path), dtype=dt
            )

    return params


def cast_params_for_serving(params: dict, dtype=None) -> dict:
    """Pre-cast float model weights to the compute dtype (default bfloat16).

    Flax modules cast every param to ``dtype`` at use, so with bf16 compute
    the arithmetic is identical either way — but storing f32 weights makes
    each step re-read 2x the bytes from HBM and run a convert per op
    (profiled: a visible slice of RMVPE's runtime at B=32). The retrieval
    ``index`` subtree is left alone: its dtype policy is ``index_dtype``
    (norms/offsets must stay full precision).
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.asarray(leaf, dtype)
        return leaf

    out = {}
    for key, sub in params.items():
        out[key] = sub if key == "index" else jax.tree.map(cast, sub)
    return out


# ---------------------------------------------------------------------------
# native serialized format (no torch needed at serving time)
# ---------------------------------------------------------------------------


def save_params(path: str | pathlib.Path, params: Any) -> None:
    """Serialize a converted params pytree to flax msgpack — the framework's
    own artifact format (the analog of the reference's ONNX files + EP
    engine caches, ``models.rs:14-17,57``; pairs with the persistent XLA
    compile cache for cold-start-free serving)."""
    from flax import serialization

    data = serialization.msgpack_serialize(jax.tree.map(lambda x: np.asarray(x), params))
    pathlib.Path(path).write_bytes(data)


def load_params(path: str | pathlib.Path) -> Any:
    from flax import serialization

    return serialization.msgpack_restore(pathlib.Path(path).read_bytes())


def enable_compilation_cache(cache_dir: str | pathlib.Path = "~/.cache/obs_rvc_tpu/xla") -> None:
    """Persist compiled executables across processes so serving/bench
    restarts skip the multi-minute fused-step compile."""
    cache_dir = str(pathlib.Path(cache_dir).expanduser())
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
