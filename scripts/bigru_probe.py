"""Isolate RMVPE's BiGRU and race step-body variants (VERDICT r3 item 7).

The shipped BiGRU (models/rmvpe.py) already hoists the input projections out
of the recurrence and folds both directions into one ``lax.scan`` stacked on
a leading [2] axis (einsum ``dbh,dgh->dbg`` per step = a batched-2 matmul).
Candidates that could beat it:

- ``blockdiag``: concatenate the two direction states into one [B, 2H] row
  block and multiply by a block-diagonal [2H, 6H] weight — 2x the FLOPs but
  ONE MXU op per step instead of a batched pair (batched matmuls with tiny
  M are issue-bound, not FLOP-bound).
- ``unroll=k`` sweep: the step is latency-bound; deeper unrolling lets XLA
  overlap the next step's elementwise work with the current matmul.
- f32 vs bf16 (the [B, 512] x [512, 1536] op is small enough that dtype may
  not matter).

Usage (TPU): NET_BATCH=32 python scripts/bigru_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench
from obs_rvc_tpu.models.rmvpe import BiGRU

B = int(os.environ.get("NET_BATCH", "32"))
T, IN, H = 64, 384, 256


def gru_scan_variant(params, x, *, unroll=8, blockdiag=False, dtype=jnp.bfloat16):
    """Same math as models/rmvpe.py BiGRU (torch gate order r,z,n), with the
    step body's recurrent matmul in the chosen form."""
    w_ih = params["w_ih"].astype(dtype)   # [2, 3H, IN]
    w_hh = params["w_hh"].astype(dtype)   # [2, 3H, H]
    b_ih = params["b_ih"].astype(dtype)   # [2, 3H]
    b_hh = params["b_hh"].astype(dtype)   # [2, 3H]
    x = x.astype(dtype)

    gi_f = x @ w_ih[0].T + b_ih[0]
    gi_b = x[:, ::-1, :] @ w_ih[1].T + b_ih[1]
    gi = jnp.stack([gi_f, gi_b], axis=0)            # [2, B, T, 3H]

    if blockdiag:
        # one [2H, 6H] block-diagonal recurrent weight: h_cat [B, 2H] row
        # block -> gh_cat [B, 6H]; zeros in the off blocks burn FLOPs but
        # collapse the batched pair into a single MXU op
        wbd = jnp.zeros((2 * H, 6 * H), dtype)
        wbd = wbd.at[:H, : 3 * H].set(w_hh[0].T)
        wbd = wbd.at[H:, 3 * H :].set(w_hh[1].T)
        b_cat = jnp.concatenate([b_hh[0], b_hh[1]])  # [6H]

        def step(h_cat, gi_t):                       # h_cat [B, 2H]
            gh = h_cat @ wbd + b_cat                 # [B, 6H]
            gh = gh.reshape(B, 2, 3 * H).swapaxes(0, 1)   # [2, B, 3H]
            i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            h = h_cat.reshape(B, 2, H).swapaxes(0, 1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1.0 - z) * n + z * h            # [2, B, H]
            return h_new.swapaxes(0, 1).reshape(B, 2 * H), h_new

        h0 = jnp.zeros((B, 2 * H), dtype)
    else:
        def step(h, gi_t):                           # h [2, B, H]
            gh = jnp.einsum("dbh,dgh->dbg", h, w_hh) + b_hh[:, None, :]
            i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((2, B, H), dtype)

    _, ys = jax.lax.scan(step, h0, jnp.moveaxis(gi, 2, 0), unroll=unroll)
    fwd = jnp.swapaxes(ys[:, 0], 0, 1)
    bwd = jnp.swapaxes(ys[:, 1], 0, 1)[:, ::-1, :]
    return jnp.concatenate([fwd, bwd], axis=-1)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))

    # shipped module (bf16), as the baseline
    gru = BiGRU(H, 1, dtype=jnp.bfloat16)
    gparams = gru.init(jax.random.PRNGKey(2), x)
    slope_bench(f"bigru_shipped B={B}", lambda p, g: gru.apply(p, g), x, params=gparams)

    params = {
        "w_ih": jnp.asarray(rng.standard_normal((2, 3 * H, IN)).astype(np.float32) * 0.05),
        "w_hh": jnp.asarray(rng.standard_normal((2, 3 * H, H)).astype(np.float32) * 0.05),
        "b_ih": jnp.zeros((2, 3 * H), jnp.float32),
        "b_hh": jnp.zeros((2, 3 * H), jnp.float32),
    }

    # parity gate between the two bodies before trusting timings
    a = np.asarray(gru_scan_variant(params, x, blockdiag=False, dtype=jnp.float32))
    b = np.asarray(gru_scan_variant(params, x, blockdiag=True, dtype=jnp.float32))
    np.testing.assert_allclose(a, b, atol=1e-4)
    print("blockdiag parity ok", flush=True)

    for unroll in (1, 4, 8, 16, 32, 64):
        slope_bench(
            f"einsum2 unroll={unroll}",
            lambda p, g, u=unroll: gru_scan_variant(p, g, unroll=u),
            x, params=params,
        )
    for unroll in (8, 16, 32, 64):
        slope_bench(
            f"blockdiag unroll={unroll}",
            lambda p, g, u=unroll: gru_scan_variant(p, g, unroll=u, blockdiag=True),
            x, params=params,
        )
    slope_bench(
        "einsum2 f32 unroll=8",
        lambda p, g: gru_scan_variant(p, g, dtype=jnp.float32),
        x, params=params,
    )


if __name__ == "__main__":
    main()
