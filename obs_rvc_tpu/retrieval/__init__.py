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
- :mod:`faiss_reader` — loader for RVC index artifacts: faiss
  ``IndexIVFFlat`` files (the ``.index`` RVC trains) and the plain
  ``total_fea.npy`` feature dumps.
"""

from obs_rvc_tpu.retrieval.index import RetrievalIndex, knn_blend
from obs_rvc_tpu.retrieval.faiss_reader import load_index_vectors
from obs_rvc_tpu.retrieval.build import build_index, extract_features

__all__ = ["RetrievalIndex", "knn_blend", "load_index_vectors", "build_index", "extract_features"]
