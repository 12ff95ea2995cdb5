"""Wire-compatible implementation of the reference's RPC protocol.

Protocol (``/root/reference/obs-rvc/src/rvcadapter.rs:60-119`` client,
``rvc-rpc/src/main.rs:64-101`` server), little-endian:

    request:  [num_samples: u32][num_samples × f32]
              [sample_frame_16k_size: u32][pitch_shift: i32]
              [skip_head: u32][return_length: u32]
    response: [num_samples: u32][num_samples × f32]

The reference runs this over the child's stdin/stdout (spawned per filter,
``rvcadapter.rs:37-48``); we serve it over stdio (drop-in for the
``rvc-rpc`` binary) or TCP so a legacy client can talk to a TPU host.
On engine error the server responds with a zero-length payload — the client
treats short reads as IoError and respawns (``rvcadapter.rs:102-118``),
matching the reference's crash-recovery contract.
"""

from __future__ import annotations

import argparse
import socket
import struct
import sys
from typing import BinaryIO

import numpy as np

from obs_rvc_tpu.stream.engine import EngineError, RvcEngine


def _read_exact(f: BinaryIO, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        got = f.read(n - len(buf))
        if not got:
            raise EOFError("peer closed")
        buf += got
    return buf


def serve_stream(engine: RvcEngine, rin: BinaryIO, rout: BinaryIO) -> None:
    """Blocking request loop (mirrors rvc-rpc/src/main.rs:64-101)."""
    while True:
        try:
            (n,) = struct.unpack("<I", _read_exact(rin, 4))
        except EOFError:
            return
        samples = np.frombuffer(_read_exact(rin, 4 * n), dtype="<f4").copy()
        n16k, pitch, skip, ret = struct.unpack("<IiII", _read_exact(rin, 16))
        try:
            out = engine.infer(samples, n16k, pitch, skip, ret)
        except EngineError as e:
            print(f"engine error: {e}", file=sys.stderr)
            rout.write(struct.pack("<I", 0))
            rout.flush()
            continue
        out = np.ascontiguousarray(out, dtype="<f4")
        rout.write(struct.pack("<I", out.size))
        rout.write(out.tobytes())
        rout.flush()


def serve_tcp(engine: RvcEngine, host: str, port: int) -> None:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as srv:
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(1)
        print(f"rvc-rpc listening on {host}:{port}", file=sys.stderr)
        while True:
            conn, addr = srv.accept()
            print(f"client {addr}", file=sys.stderr)
            with conn, conn.makefile("rb") as rin, conn.makefile("wb") as rout:
                try:
                    serve_stream(engine, rin, rout)
                except (EOFError, ConnectionError):
                    pass


class RpcClient:
    """The reference's adapter side (``rvcadapter.rs``) for tests and for
    driving a remote TPU host from a local capture client."""

    def __init__(self, rin: BinaryIO, rout: BinaryIO):
        self._rin = rin
        self._rout = rout

    @staticmethod
    def connect_tcp(host: str, port: int) -> "RpcClient":
        sock = socket.create_connection((host, port))
        return RpcClient(sock.makefile("rb"), sock.makefile("wb"))

    def infer(
        self,
        samples: np.ndarray,
        sample_frame_16k_size: int,
        pitch_shift: int,
        skip_head: int,
        return_length: int,
    ) -> np.ndarray:
        samples = np.ascontiguousarray(samples, dtype="<f4")
        self._rout.write(struct.pack("<I", samples.size))
        self._rout.write(samples.tobytes())
        self._rout.write(
            struct.pack("<IiII", sample_frame_16k_size, pitch_shift, skip_head, return_length)
        )
        self._rout.flush()
        (n,) = struct.unpack("<I", _read_exact(self._rin, 4))
        if n == 0:
            raise EngineError("server reported engine error")
        return np.frombuffer(_read_exact(self._rin, 4 * n), dtype="<f4").copy()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="TPU rvc-rpc server")
    parser.add_argument("--stdio", action="store_true", help="serve on stdin/stdout")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=17895)
    parser.add_argument("--model-version", default="v2", choices=["v1", "v2"])
    parser.add_argument("--sample-rate", type=int, default=48000)
    parser.add_argument("--dest-sample-rate", type=int, default=40000)
    parser.add_argument("--checkpoint", help="RVC .pth checkpoint (random init if omitted)")
    parser.add_argument("--exec-cache", action="store_true",
                        help="persist compiled per-geometry executables to disk")
    args = parser.parse_args(argv)

    import jax

    from obs_rvc_tpu.config import RvcModelVersion, StreamSettings
    from obs_rvc_tpu.stream.pipeline import RvcPipeline

    settings = StreamSettings(
        model_version=RvcModelVersion.from_str(args.model_version),
        dest_sample_rate=args.dest_sample_rate,
    )
    pipe = RvcPipeline(settings.chunk_config(args.sample_rate), settings.model_version)
    if args.checkpoint:
        from obs_rvc_tpu.models.checkpoints import load_pipeline_params

        params = load_pipeline_params(pipe, synthesizer_path=args.checkpoint)
    else:
        params = pipe.init_params(jax.random.PRNGKey(0))
    engine = RvcEngine(pipe, params, exec_cache=args.exec_cache)

    if args.stdio:
        serve_stream(engine, sys.stdin.buffer, sys.stdout.buffer)
    else:
        serve_tcp(engine, args.host, args.port)


if __name__ == "__main__":
    main()
