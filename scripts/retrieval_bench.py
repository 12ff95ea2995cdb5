"""1M-vector retrieval cost on the real chip (BASELINE config 4).

Measures the XLA exact path (`knn_blend`, lax.top_k over the full [Q, N]
scores) and the IVF probed-union path, each with f32 and bf16 tables.
Amortized slope timing via `benchlib.slope_bench` (transfer-forced sync).

(A Pallas blocked exact top-k kernel was measured here through round 3 and
RETIRED: 14.6 vs 6.9 ms f32 / 9.9 vs 5.4 ms bf16 at 1M vectors — see
BENCHMARKS.md "Retrieval" for the negative-result analysis.)

Env: RETRIEVAL_N (default 1_000_000), RETRIEVAL_Q (default 120).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench
from obs_rvc_tpu.retrieval.index import knn_blend


def main():
    N = int(os.environ.get("RETRIEVAL_N", "1000000"))
    Q = int(os.environ.get("RETRIEVAL_Q", "120"))
    C = 768

    rng = np.random.default_rng(0)
    table = rng.standard_normal((N, C)).astype(np.float32)
    norms = np.sum(table * table, axis=-1)
    phone = rng.standard_normal((1, Q, C)).astype(np.float32) * 0.3

    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        v = jax.device_put(jnp.asarray(table, dtype))
        nrm = jax.device_put(jnp.asarray(norms))
        q0 = jax.device_put(jnp.asarray(phone))
        jax.block_until_ready((v, nrm, q0))

        # feedback-friendly: blend output has the query's shape
        slope_bench(
            f"knn_blend_{tag}",
            lambda p, q: knn_blend(p["v"], p["n"], q, 0.75),
            q0,
            n1=4,
            n2=24,
            params={"v": v, "n": nrm},
        )
        del v, nrm, q0

    # ivf mode: probed-union search (retrieval.index.ivf_knn_blend). Search
    # cost depends only on the list geometry (nlist, lcap, probes), not on
    # cluster quality, so synthesize equal-size lists instead of running
    # k-means on random data.
    from obs_rvc_tpu.retrieval.faiss_reader import IvfFlatIndex
    from obs_rvc_tpu.retrieval.index import RetrievalIndex

    nlist = max(4, min(int(16 * np.sqrt(N)), N // 39))  # RVC sizing rule
    assignments = (np.arange(N) * nlist // N).astype(np.int32)  # equal lists
    centroids = rng.standard_normal((nlist, C)).astype(np.float32)
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ridx = RetrievalIndex(mode="ivf", probes=max(64, Q))
        p = ridx.make_ivf_params(
            IvfFlatIndex(table, centroids, assignments), dtype=dtype
        )
        p = jax.device_put({k: jnp.asarray(v) for k, v in p.items()})
        q0 = jax.device_put(jnp.asarray(phone))
        jax.block_until_ready((p, q0))
        slope_bench(
            f"ivf_knn_blend_{tag} (nlist={nlist} lcap={ridx.lcap} probes={max(64, Q)})",
            lambda prm, q: ridx.blend(prm, q, 0.75),
            q0,
            n1=4,
            n2=24,
            params=p,
        )
        del p, q0


if __name__ == "__main__":
    main()
