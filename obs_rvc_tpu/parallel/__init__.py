"""Device-mesh parallelism.

The reference has no parallelism beyond one worker thread + one subprocess
(SURVEY §2.4); scaling here is TPU-native:

- **DP** — concurrent utterance streams batched along a ``data`` mesh axis
  (the reference's "one filter instance = one stream", multiplied).
- **TP** — encoder/synthesizer weight sharding along a ``model`` axis via
  NamedSharding + GSPMD-inserted collectives over ICI.
- **EP-like index sharding** — the retrieval index is partitioned across the
  ``model`` axis; per-shard top-k merges with ``psum``/``all_gather``
  (see ``obs_rvc_tpu.retrieval``).
- SP/PP/ring-attention are deliberately out of scope: sequence length is
  bounded by design (≤ ~2.7 s context; SURVEY §5 "long-context").
"""

from obs_rvc_tpu.parallel.mesh import make_mesh, parse_mesh_spec
from obs_rvc_tpu.parallel.sharding import (
    shard_params,
    shard_state,
    shard_controls,
    param_partition_spec,
)

__all__ = [
    "make_mesh",
    "parse_mesh_spec",
    "shard_params",
    "shard_state",
    "shard_controls",
    "param_partition_spec",
]
