"""A/B batched SOLA-offset correlation formulations at NET_BATCH streams.

The B=1 channel-blocked conv (dsp/sola.py) is µs-fast, but under vmap the
per-stream kernel turns it into a grouped conv that XLA lowers to a
degenerate T(1,128) fusion — 4.0 ms at B=32 (85% of the whole post stage).
Candidates:
  conv     — current vmapped channel-blocked conv (baseline)
  fft      — circular cross-correlation via rfft/irfft (batch-native)
  patches  — conv_general_dilated_patches frames + batched dot_general

Usage (TPU): NET_BATCH=32 python scripts/sola_batch_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench
from obs_rvc_tpu.config import StreamSettings
from obs_rvc_tpu.dsp.sola import sola_offset

B = int(os.environ.get("NET_BATCH", "32"))


def nom_fft(conv_input, sola_buffer, n_offsets):
    L = conv_input.shape[-1]
    n_fft = 1
    while n_fft < L + n_offsets:
        n_fft <<= 1
    fx = jnp.fft.rfft(conv_input, n_fft)
    fs = jnp.fft.rfft(sola_buffer, n_fft)
    return jnp.fft.irfft(fx * jnp.conj(fs), n_fft)[..., :n_offsets].astype(jnp.float32)


def nom_patches(conv_input, sola_buffer, n_offsets, buffer):
    # frames [B, n_offsets, buffer] via identity-kernel conv, then batched dot
    x = conv_input[:, None, :].astype(jnp.bfloat16)  # [B, 1, L]
    pat = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(buffer,), window_strides=(1,), padding="VALID"
    )  # [B, buffer, n_offsets]
    return jax.lax.dot_general(
        sola_buffer.astype(jnp.bfloat16)[:, None, :],  # [B, 1, buffer]
        pat,                                            # [B, buffer, n_offsets]
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]


def offset_from_nom(nom, conv_input, buffer, n_offsets):
    sq = conv_input * conv_input
    csum = jnp.cumsum(jnp.pad(sq, ((0, 0), (1, 0))), axis=-1)
    energy = csum[:, buffer:] - csum[:, :n_offsets]
    return jnp.argmax(nom / jnp.sqrt(energy + 1e-8), axis=-1).astype(jnp.int32)


def main():
    cfg = StreamSettings().chunk_config(48000)
    buffer = cfg.sola_buffer_frame_size
    search = cfg.sola_search_frame_size
    n_offsets = search + 1
    L = buffer + search
    rng = np.random.default_rng(0)
    out48len = cfg.model_return_size * cfg.sample_rate // cfg.model_sample_rate
    out = jnp.asarray(rng.standard_normal((B, out48len)).astype(np.float32) * 0.1)
    sola = jnp.asarray(rng.standard_normal((B, buffer)).astype(np.float32) * 0.1)
    print(f"B={B} buffer={buffer} search={search}")

    voff = jax.vmap(lambda o, s: sola_offset(o, s, buffer, search))
    f_conv = lambda o: voff(o, sola).astype(jnp.float32)[:, None]
    f_fft = lambda o: offset_from_nom(
        nom_fft(o[:, :L], sola, n_offsets), o[:, :L], buffer, n_offsets
    ).astype(jnp.float32)[:, None]
    f_pat = lambda o: offset_from_nom(
        nom_patches(o[:, :L], sola, n_offsets, buffer), o[:, :L], buffer, n_offsets
    ).astype(jnp.float32)[:, None]

    # agreement check (argmax ties aside, these should match exactly)
    a = np.asarray(jax.jit(f_conv)(out))
    b = np.asarray(jax.jit(f_fft)(out))
    c = np.asarray(jax.jit(f_pat)(out))
    print("conv vs fft match:", int((a == b).sum()), "/", B)
    print("conv vs patches match:", int((a == c).sum()), "/", B)

    slope_bench("sola_fft", f_fft, out)
    slope_bench("sola_patches", f_pat, out)
    slope_bench("sola_conv(vmap)", f_conv, out)


if __name__ == "__main__":
    main()
