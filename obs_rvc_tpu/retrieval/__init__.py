"""Feature retrieval ("the R in RVC").

The reference plumbs ``index_path``/``index_rate`` end-to-end but never
implements the search — ``/root/reference/rvc/src/rvc.rs:159`` is literally
``// TODO: index search`` (SURVEY §2.2). This package implements it
TPU-natively:

- :mod:`index` — brute-force exact kNN over the feature table as MXU
  matmuls, with the RVC blending semantics
  (``weight = 1/d²`` normalized, ``feats = rate·knn + (1-rate)·feats``),
  plus a mesh-sharded variant (table split over the ``model`` axis,
  per-shard top-k merged with ``all_gather``).
- :mod:`index` (ivf mode) — TPU-native ``nprobe`` search: chunk-union list
  probing over a list-major reordered table with fixed-size slab gathers;
  recall ⊇ faiss ``nprobe=1`` (RVC's production setting) at default
  geometry. See :func:`index.ivf_knn_blend`.
- :mod:`faiss_reader` — loader for RVC index artifacts: faiss
  ``IndexIVFFlat`` files (the ``.index`` RVC trains, coarse structure
  included) and the plain ``total_fea.npy`` feature dumps.
- :mod:`build` — index construction: feature extraction, k-means IVF
  training, faiss-compatible export.
"""

from obs_rvc_tpu.retrieval.index import RetrievalIndex, ivf_knn_blend, knn_blend
from obs_rvc_tpu.retrieval.faiss_reader import (
    IvfFlatIndex,
    load_index_vectors,
    read_ivf_flat_full,
)
from obs_rvc_tpu.retrieval.build import build_index, extract_features, train_ivf

__all__ = [
    "RetrievalIndex", "knn_blend", "ivf_knn_blend", "load_index_vectors",
    "IvfFlatIndex", "read_ivf_flat_full", "build_index", "extract_features",
    "train_ivf",
]
