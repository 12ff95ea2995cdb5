"""Probe: does the axon PJRT backend support executable serialization?

If `jax.experimental.serialize_executable.serialize` round-trips through the
tunnel, we get a deterministic answer to the fused-step compile lottery
(VERDICT r2 weak #6 / item 9): compile once (however long the remote service
takes), persist the executable bytes, and every later process deserializes in
seconds instead of re-entering the 3-min-or-hang remote compile.

Usage (TPU, two separate processes):
    timeout -s KILL 900 python scripts/exec_cache_probe.py save [--fused]
    timeout -s KILL 300 python scripts/exec_cache_probe.py load [--fused]

`save` compiles (timed), runs once, serializes to EXEC_CACHE_PATH
(default /tmp/exec_cache_probe.bin) together with the pickled in/out trees.
`load` deserializes (timed), runs, and checks the result against the value
saved by `save`.

Without --fused the program is a small-but-nontrivial composite (matmul +
Pallas resblock bank) — a capability probe that fails fast. With --fused it
is the full RvcPipeline.step at B=1, the artifact that actually matters.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.serialize_executable import deserialize_and_load, serialize

PATH = os.environ.get("EXEC_CACHE_PATH", "/tmp/exec_cache_probe.bin")


def build_small():
    from obs_rvc_tpu.ops.resblock import resblock_bank

    rng = np.random.default_rng(0)
    ks, dil = (3, 7), (1, 3)
    params = []
    for k in ks:
        mk = lambda *sh: jnp.asarray(
            (rng.standard_normal(sh) * 0.05).astype(np.float32))
        params.append((mk(2, k, 32, 32), mk(2, 32), mk(2, k, 32, 32), mk(2, 32)))
    x = jnp.asarray(rng.standard_normal((1, 3584, 32)).astype(np.float32) * 0.3,
                    jnp.bfloat16)

    def fn(p, xx):
        y = resblock_bank(xx, p, ks, dil)
        return jnp.dot(y[0].T.astype(jnp.bfloat16), y[0].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    return fn, (params, x)


def build_fused():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    return fn, args


def out_probe(out):
    leaves = jax.tree.leaves(out)
    return np.asarray(leaves[0], np.float32).ravel()[:8]


def main():
    fused = "--fused" in sys.argv
    phase = sys.argv[1]
    fn, args = build_fused() if fused else build_small()
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)

    if phase == "save":
        t0 = time.time()
        lowered = jfn.lower(*args)
        compiled = lowered.compile()
        t_compile = time.time() - t0
        print(f"compile: {t_compile:.1f}s", flush=True)
        out = compiled(*args)
        jax.block_until_ready(out)
        probe = out_probe(out)
        t0 = time.time()
        payload, in_tree, out_tree = serialize(compiled)
        blob = pickle.dumps((payload, in_tree, out_tree, probe))
        with open(PATH, "wb") as f:
            f.write(blob)
        print(f"serialize: {time.time() - t0:.1f}s, {len(blob)/1e6:.1f} MB -> {PATH}",
              flush=True)
    elif phase == "load":
        with open(PATH, "rb") as f:
            payload, in_tree, out_tree, want = pickle.loads(f.read())
        t0 = time.time()
        compiled = deserialize_and_load(payload, in_tree, out_tree)
        t_load = time.time() - t0
        out = compiled(*args)
        jax.block_until_ready(out)
        t_total = time.time() - t0
        got = out_probe(out)
        ok = np.allclose(want, got, rtol=2e-2, atol=2e-2)
        print(f"deserialize: {t_load:.1f}s, first-run total {t_total:.1f}s, "
              f"output match: {ok}", flush=True)
        if not ok:
            print(f"  want {want}\n  got  {got}", flush=True)
            sys.exit(1)
    else:
        raise SystemExit("phase must be save|load")


if __name__ == "__main__":
    main()
