"""Write .exec_cache/MANIFEST.json for the committed cache artifacts.

The repo commits primed PJRT executables as ``.exec_cache/*.exe.pkl.gz`` so
a fresh checkout (the driver's bench environment resets to git-tracked
state) warm-starts ``bench.py`` without touching the erratic remote
compile. The cache key hashes the traced-source files — so an edit to any
traced module silently orphans the committed artifact and the next bench
run pays a full compile again.

This script records, for the default ``bench.py`` B=1 fused entry, every
key ingredient that is NOT derivable on CPU (the arg-signature/device env
parts captured on the real TPU) plus those that are (the semantic key,
KEY_VERSION). ``tests/test_coverage_extras.py::test_exec_cache_manifest_fresh``
then recomputes the digest on CPU against the CURRENT traced sources and
fails loudly if the committed artifact went stale.

Run on the TPU (one python process at a time — docs/DEVELOPMENT.md):

    python scripts/exec_cache_manifest.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from obs_rvc_tpu.config import StreamSettings
from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState
from obs_rvc_tpu.utils import exec_cache as ec


def main() -> None:
    cfg = StreamSettings().chunk_config(48000)
    pipe = RvcPipeline(cfg, compute_dtype=jnp.bfloat16)
    params = pipe.init_params_fast(0)
    from obs_rvc_tpu.models.checkpoints import cast_params_for_serving

    params = jax.device_put(cast_params_for_serving(params))
    state = StreamState.init(cfg)
    chunk = jnp.zeros((cfg.sample_frame_size,), jnp.float32)
    controls = StepControls.default(pitch_shift=12.0, rms_mix_rate=0.5)

    semantic_key = pipe.fingerprint() + "|jit_step"
    pinned = ec._pin_unsharded((params, state, chunk, controls))
    env = ec._env_key_parts(pinned)
    digest = ec._digest(
        [ec.KEY_VERSION, "semantic", semantic_key, ec.traced_source_fingerprint()]
        + env
        + [""]
    )

    cache_dir = pathlib.Path(ec.DEFAULT_DIR)
    entry = cache_dir / f"{digest}.exe.pkl"
    gz = entry.with_name(entry.name + ".gz")
    status = (
        "raw+gz" if entry.exists() and gz.exists()
        else "raw" if entry.exists()
        else "gz" if gz.exists()
        else "MISSING"
    )
    manifest = {
        "entries": [
            {
                "file": f"{digest}.exe.pkl.gz",
                "label": "bench.py B=1 fused (default flags)",
                "semantic_key": semantic_key,
                "traced_source_fingerprint": ec.traced_source_fingerprint(),
                "env_parts": env,
                "tag": "",
                "key_version": ec.KEY_VERSION,
            }
        ]
    }
    (cache_dir / "MANIFEST.json").write_text(json.dumps(manifest, indent=1))
    print(f"digest {digest} status {status} -> MANIFEST.json written")
    if status == "MISSING":
        sys.exit(1)


if __name__ == "__main__":
    main()
