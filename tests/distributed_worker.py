"""Worker process for the multi-process ``jax.distributed`` CPU test.

Launched by ``tests/test_distributed_multiprocess.py`` as N processes × 4
virtual CPU devices each; builds the global ``('data','model')`` mesh over
all processes, runs one batched (DP) stream step on globally-sharded
state/chunks, and writes the all-gathered output (process 0) so the parent
can assert parity with a single-process run. This is the DCN code path of
SURVEY §2.4 executing for real — ``jax.distributed.initialize`` + cross-
process collectives — which TPU pods use across hosts.

Usage: python distributed_worker.py <proc_id> <nprocs> <port> <outdir>
"""

import os
import sys

proc_id, nprocs, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out of tests
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from obs_rvc_tpu.parallel import distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=proc_id
)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.local_devices()) == 4
assert jax.device_count() == 4 * nprocs

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from obs_rvc_tpu.config import ChunkConfig  # noqa: E402
from obs_rvc_tpu.stream.pipeline import RvcPipeline, StepControls  # noqa: E402
from obs_rvc_tpu.stream.state import StreamState  # noqa: E402

# DP-only global mesh: every chip is a stream slot
mesh = distributed.global_mesh(n_model=1)
assert distributed.local_stream_slots(mesh) == 4

# with TP=2 the first-model-shard convention gives 2 feeders per process
mesh_tp = distributed.global_mesh(n_model=2)
assert distributed.local_stream_slots(mesh_tp) == 2

cfg = ChunkConfig.build(
    sample_rate=48000, sample_length=0.10, extra_inference_time=0.50, skip_inference=True
)
pipe = RvcPipeline(cfg)
B = 4 * nprocs
rng = np.random.default_rng(0)  # same seed everywhere → same global input
chunks = rng.standard_normal((B, cfg.sample_frame_size)).astype(np.float32) * 0.1
state = StreamState.init_batch(cfg, B)
controls = jax.tree.map(
    lambda *xs: jnp.stack(xs), *[StepControls.default() for _ in range(B)]
)


def put(x):
    x = np.asarray(x)
    sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


gstate = jax.tree.map(put, state)
gchunks = put(chunks)
gcontrols = jax.tree.map(put, controls)

step = jax.jit(jax.vmap(pipe.step, in_axes=(None, 0, 0, 0)))
with mesh:
    new_state, out = step({}, gstate, gchunks, gcontrols)

out_full = multihost_utils.process_allgather(out, tiled=True)
buf16_full = multihost_utils.process_allgather(new_state.input_buffer_16k, tiled=True)
if proc_id == 0:
    np.save(os.path.join(outdir, "dist_out.npy"), np.asarray(out_full))
    np.save(os.path.join(outdir, "dist_buf16.npy"), np.asarray(buf16_full))
print(f"worker {proc_id} ok", flush=True)
