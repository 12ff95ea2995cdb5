"""Duplex PCM streaming server — the modern front door.

Where ``serve.rpc`` reproduces the reference's engine-level protocol (16 kHz
model buffers in, model-rate audio out), this serves *device-rate* audio
end-to-end: the client streams mono PCM frames of any size and receives
converted frames, with the whole chunk pipeline (ring buffers, SOLA, RMS)
server-side — i.e. the role of the OBS filter itself, over a socket.

Wire protocol (little-endian, tag-framed):

    client → server:
        0x01 [u32 n][n × f32]        audio frame (device-rate mono)
        0x02 [u32 len][JSON]         live control update
                                     {"pitch_shift": 12, "rms_mix_rate": .5,
                                      "index_rate": 0, "sid": 0}
        0x03                          flush/close
    server → client (after each audio frame):
        0x01 [u32 n][n × f32]        converted audio available so far
                                     (n may be 0 while the pipeline fills)

Per-connection state is one :class:`StreamSession`; the conversion worker
runs on the session's thread, so the socket loop never blocks on TPU work.
"""

from __future__ import annotations

import json
import socket
import struct
import sys
from typing import BinaryIO

import numpy as np

from obs_rvc_tpu.stream.scheduler import StreamSession

TAG_AUDIO = 1
TAG_CONTROL = 2
TAG_CLOSE = 3


def _read_exact(f: BinaryIO, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        got = f.read(n - len(buf))
        if not got:
            raise EOFError
        buf += got
    return buf


def encode_audio_message(frame: np.ndarray) -> bytes:
    frame = np.ascontiguousarray(frame, dtype="<f4")
    return bytes([TAG_AUDIO]) + struct.pack("<I", frame.size) + frame.tobytes()


def handle_message(session, payload: bytes) -> tuple[bytes | None, bool]:
    """Process one tag-framed protocol message against a session. Returns
    ``(reply bytes or None, closed)``. Shared by the raw-TCP byte-stream
    loop and the WebSocket front door (serve.ws), which differ only in
    transport framing."""
    tag = payload[0]
    if tag == TAG_AUDIO:
        (n,) = struct.unpack("<I", payload[1:5])
        frame = np.frombuffer(payload[5 : 5 + 4 * n], dtype="<f4")
        session.push_audio(frame)
        out = session.pull_audio(n)
        return encode_audio_message(out), False
    if tag == TAG_CONTROL:
        (ln,) = struct.unpack("<I", payload[1:5])
        session.update_controls(**json.loads(payload[5 : 5 + ln]))
        return None, False
    if tag == TAG_CLOSE:
        return None, True
    raise ValueError(f"unknown tag {tag}")


def read_message(rin: BinaryIO) -> bytes:
    """Read one tag-framed message off a byte stream (raises EOFError)."""
    head = _read_exact(rin, 1)
    tag = head[0]
    if tag == TAG_CLOSE:
        return head
    if tag in (TAG_AUDIO, TAG_CONTROL):
        ln_raw = _read_exact(rin, 4)
        (n,) = struct.unpack("<I", ln_raw)
        body = _read_exact(rin, 4 * n if tag == TAG_AUDIO else n)
        return head + ln_raw + body
    raise ValueError(f"unknown tag {tag}")


def serve_connection(session: StreamSession, rin: BinaryIO, rout: BinaryIO) -> None:
    session.start()
    try:
        while True:
            try:
                msg = read_message(rin)
            except EOFError:
                return
            reply, closed = handle_message(session, msg)
            if reply is not None:
                rout.write(reply)
                rout.flush()
            if closed:
                return
    finally:
        session.stop()


class StreamClient:
    """Client side of the duplex protocol."""

    def __init__(self, rin: BinaryIO, rout: BinaryIO):
        self._rin = rin
        self._rout = rout

    @staticmethod
    def connect_tcp(host: str, port: int) -> "StreamClient":
        sock = socket.create_connection((host, port))
        return StreamClient(sock.makefile("rb"), sock.makefile("wb"))

    def send_audio(self, frame: np.ndarray) -> np.ndarray:
        frame = np.ascontiguousarray(frame, dtype="<f4")
        self._rout.write(bytes([TAG_AUDIO]))
        self._rout.write(struct.pack("<I", frame.size))
        self._rout.write(frame.tobytes())
        self._rout.flush()
        tag = _read_exact(self._rin, 1)[0]
        assert tag == TAG_AUDIO
        (n,) = struct.unpack("<I", _read_exact(self._rin, 4))
        return np.frombuffer(_read_exact(self._rin, 4 * n), dtype="<f4").copy()

    def update_controls(self, **updates) -> None:
        payload = json.dumps(updates).encode()
        self._rout.write(bytes([TAG_CONTROL]))
        self._rout.write(struct.pack("<I", len(payload)))
        self._rout.write(payload)
        self._rout.flush()

    def close(self) -> None:
        try:
            self._rout.write(bytes([TAG_CLOSE]))
            self._rout.flush()
        except Exception:
            pass


class _PoolSlotAdapter:
    """Presents one StreamPool slot with the StreamSession interface the
    connection loop uses (push/pull/update/start/stop)."""

    def __init__(self, pool, slot: int):
        self._pool = pool
        self._slot = slot

    def start(self) -> None:
        pass  # pool worker runs globally

    def stop(self) -> None:
        self._pool.detach(self._slot)

    def push_audio(self, frame: np.ndarray) -> int:
        return self._pool.push_audio(self._slot, frame)

    def pull_audio(self, n: int) -> np.ndarray:
        return self._pool.pull_audio(self._slot, n)

    def update_controls(self, **kw) -> None:
        self._pool.update_controls(self._slot, **kw)


def serve_tcp(make_session, host: str, port: int, pool=None,
              ready=None, stop_event=None) -> None:
    """Accept loop. With ``pool`` (a started StreamPool), every connection
    claims a pool slot and all voices batch through one vmapped step per
    tick (DP on-chip); otherwise ``make_session()`` builds an independent
    StreamSession per connection. Connections are served on threads either
    way.

    ``ready(bound_port)`` fires once the socket listens (lets callers bind
    port 0 for an ephemeral port); ``stop_event`` (a ``threading.Event``)
    ends the accept loop — in-flight connections finish on their threads."""
    import threading

    def handle(conn, addr):
        print(f"stream client {addr}", file=sys.stderr)
        with conn, conn.makefile("rb") as rin, conn.makefile("wb") as rout:
            try:
                if pool is not None:
                    session = _PoolSlotAdapter(pool, pool.attach())
                else:
                    session = make_session()
                serve_connection(session, rin, rout)
            except (EOFError, ConnectionError):
                pass
            except RuntimeError as e:  # pool full
                print(f"rejecting {addr}: {e}", file=sys.stderr)

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as srv:
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(16)
        print(f"stream server on {host}:{srv.getsockname()[1]}", file=sys.stderr)
        if ready is not None:
            ready(srv.getsockname()[1])
        if stop_event is not None:
            srv.settimeout(0.2)
        while stop_event is None or not stop_event.is_set():
            try:
                conn, addr = srv.accept()
            except socket.timeout:
                continue
            threading.Thread(target=handle, args=(conn, addr), daemon=True).start()
