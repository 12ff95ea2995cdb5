"""Retrieval index construction.

RVC builds its faiss index offline from the 100 Hz ContentVec features of
the target speaker's training clips; the reference only *consumes* the
artifact (and then doesn't — SURVEY §2.2). This module closes the loop: it
extracts features with the same encoder the pipeline serves, builds the
table, and writes any of the supported artifact formats (``.npy``,
faiss-compatible ``.index``, ``.onnx`` weights container).
"""

from __future__ import annotations

import pathlib
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from obs_rvc_tpu.dsp import resample_poly
from obs_rvc_tpu.models.contentvec import extract_feature


def extract_features(
    pipeline,
    params: dict,
    wavs: Iterable[np.ndarray],
    sample_rate: int = 16000,
    max_seconds: float = 30.0,
) -> np.ndarray:
    """Mono clips → stacked 100 Hz feature rows ``[N, C]``.

    Clips longer than ``max_seconds`` are split (bounded activation memory);
    non-16 kHz input is resampled.
    """
    rows = []
    limit = int(max_seconds * 16000)
    cv = jax.jit(lambda p, w: extract_feature(pipeline.contentvec.apply(p, w[None]))[0])
    for wav in wavs:
        wav = np.asarray(wav, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=0)
        if sample_rate != 16000:
            wav = np.asarray(resample_poly(jnp.asarray(wav), sample_rate, 16000))
        for start in range(0, len(wav), limit):
            piece = wav[start : start + limit]
            if len(piece) < 800:  # shorter than the conv receptive field
                continue
            rows.append(np.asarray(cv(params["contentvec"], jnp.asarray(piece))))
    if not rows:
        raise ValueError("no usable audio provided")
    return np.concatenate(rows, axis=0)


def build_index(
    features: np.ndarray,
    save_path: Optional[str | pathlib.Path] = None,
    max_vectors: Optional[int] = None,
    seed: int = 0,
) -> np.ndarray:
    """Feature rows → retrieval table (optionally subsampled), saved in the
    format implied by ``save_path``'s suffix (.npy / .index / .onnx)."""
    table = np.ascontiguousarray(features, dtype=np.float32)
    if max_vectors is not None and len(table) > max_vectors:
        idx = np.random.default_rng(seed).choice(len(table), max_vectors, replace=False)
        table = table[np.sort(idx)]
    if save_path is not None:
        save_path = pathlib.Path(save_path)
        if save_path.suffix == ".npy":
            np.save(save_path, table)
        elif save_path.suffix == ".index":
            from obs_rvc_tpu.retrieval.faiss_reader import write_ivf_flat

            write_ivf_flat(save_path, table, nlist=max(4, int(np.sqrt(len(table)))))
        elif save_path.suffix == ".onnx":
            from obs_rvc_tpu.models.onnx_reader import write_onnx_weights

            write_onnx_weights(save_path, {"vectors": table})
        else:
            raise ValueError(f"unknown index format {save_path.suffix!r}")
    return table
