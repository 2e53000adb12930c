"""Remote offload over TCP — the TPU-native analog of ggml's RPC backend.

The reference ships a TCP remote backend (/root/reference/ggml/src/
ggml-rpc.cpp): a client-side proxy backend serializes buffer ops and whole
graphs (`rpc_tensor`, command enum :84-96, length-prefixed frames sent by
send_rpc_cmd :255) to a server that executes them on any local backend
(GRAPH_COMPUTE :627).

On TPU the unit of remote execution is NOT an op graph — XLA owns graphs,
and shipping jaxprs would re-compile per request. The natural offload
boundary is the model runtime itself: the server owns `WhisperContext`s
(weights resident in HBM, jits warm across requests) and executes
API-level commands; the client is a same-surface proxy
(`RemoteWhisperContext`), exactly as the reference's client is a
same-surface `ggml_backend_t`. The framing mirrors ggml-rpc: one command
byte + u64-length-prefixed payload per request, a status byte +
u64-length-prefixed payload per response.

Limitations mirroring the reference: callbacks (abort/progress/segment)
cannot cross the socket and are ignored remotely; ggml-rpc likewise never
forwards ggml's abort_callback to the server.

Server:  python -m qwen2_audio_tpu.runtime.rpc --host 0.0.0.0 --port 50052
Client:  ctx = RemoteWhisperContext.connect("host:50052")
         ctx.load_model_file("model.bin"); ctx.full(params, pcm)
"""

from __future__ import annotations

import dataclasses
import json
import socket
import struct
import threading
from typing import Any

import numpy as np

from qwen2_audio_tpu.utils.logging import log_error, log_info

RPC_MAGIC = b"QARP"
RPC_VERSION = 1

# command enum (≙ rpc_cmd, ggml-rpc.cpp:84-96, at the runtime altitude)
CMD_HELLO = 0
CMD_LOAD_MODEL = 1
CMD_FULL = 2
CMD_ENCODE = 3
CMD_GET_EMB_ENC = 4
CMD_GET_SEGMENTS = 5
CMD_GET_LOGITS = 6
CMD_FREE = 7
CMD_SYSTEM_INFO = 8
CMD_SHUTDOWN = 9

STATUS_OK = 0
STATUS_ERR = 1

_MAX_PAYLOAD = 1 << 34          # 16 GiB guard against corrupt frames


# --------------------------------------------------------------------------- #
# framing (≙ send_rpc_cmd / recv_msg, ggml-rpc.cpp:255-306)
# --------------------------------------------------------------------------- #

def _send_frame(sock: socket.socket, tag: int, payload: bytes) -> None:
    sock.sendall(struct.pack("<BQ", tag, len(payload)))
    sock.sendall(payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        b = sock.recv(min(n, 1 << 20))
        if not b:
            raise ConnectionError("peer closed mid-frame")
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def _recv_frame(sock: socket.socket) -> tuple[int, bytes]:
    tag, ln = struct.unpack("<BQ", _recv_exact(sock, 9))
    if ln > _MAX_PAYLOAD:
        raise ConnectionError(f"oversized frame ({ln} bytes)")
    return tag, _recv_exact(sock, ln)


def _pack_json_arrays(meta: dict, arrays: list[np.ndarray]) -> bytes:
    """One payload = JSON header (with per-array dtype/shape manifest) +
    concatenated raw little-endian array bytes."""
    manifest = [{"dtype": str(a.dtype), "shape": list(a.shape)}
                for a in arrays]
    head = json.dumps({"meta": meta, "arrays": manifest}).encode()
    parts = [struct.pack("<I", len(head)), head]
    parts += [np.ascontiguousarray(a).tobytes() for a in arrays]
    return b"".join(parts)


def _unpack_json_arrays(payload: bytes) -> tuple[dict, list[np.ndarray]]:
    (hlen,) = struct.unpack_from("<I", payload, 0)
    head = json.loads(payload[4:4 + hlen].decode())
    arrays = []
    off = 4 + hlen
    for m in head["arrays"]:
        dt = np.dtype(m["dtype"])
        count = int(np.prod(m["shape"], dtype=np.int64)) if m["shape"] else 1
        nbytes = dt.itemsize * count
        a = np.frombuffer(payload, dtype=dt, count=count, offset=off)
        arrays.append(a.reshape(m["shape"]))
        off += nbytes
    return head["meta"], arrays


_SKIP_FIELDS = {"new_segment_callback", "progress_callback",
                "encoder_begin_callback", "abort_callback",
                "compute_dtype"}


def _sanitize(obj: Any) -> Any:
    """numpy scalars/arrays -> JSON-encodable python values."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def _params_to_dict(p: Any) -> dict:
    out = {}
    for f in dataclasses.fields(p):
        if f.name in _SKIP_FIELDS:
            continue
        out[f.name] = getattr(p, f.name)
    return out


# --------------------------------------------------------------------------- #
# server
# --------------------------------------------------------------------------- #

class RpcServer:
    """Owns WhisperContexts; executes commands serially (one TPU program
    at a time) under a lock, like the reference server executes graphs on
    its single local backend."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.create_server((host, port))
        self._sock.settimeout(0.5)
        self.host, self.port = self._sock.getsockname()[:2]
        self._contexts: dict[int, Any] = {}
        self._next_id = 1
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- lifecycle -----------------------------------------------------------
    def serve_forever(self) -> None:
        log_info("rpc: serving on %s:%d\n", self.host, self.port)
        while not self._stop.is_set():
            try:
                conn, addr = self._sock.accept()
            except socket.timeout:
                continue
            t = threading.Thread(target=self._serve_conn, args=(conn, addr),
                                 daemon=True)
            t.start()
        self._sock.close()

    def start_background(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- per-connection loop --------------------------------------------------
    def _serve_conn(self, conn: socket.socket, addr) -> None:
        try:
            with conn:
                while not self._stop.is_set():
                    try:
                        cmd, payload = _recv_frame(conn)
                    except (ConnectionError, OSError):
                        return
                    if cmd == CMD_SHUTDOWN:
                        _send_frame(conn, STATUS_OK, b"")
                        self._stop.set()
                        return
                    try:
                        resp = self._dispatch(cmd, payload)
                        _send_frame(conn, STATUS_OK, resp)
                    except Exception as e:  # noqa: BLE001 — reported to peer
                        log_error("rpc: cmd %d failed: %s\n", cmd, e)
                        _send_frame(conn, STATUS_ERR, str(e).encode())
        except Exception as e:  # noqa: BLE001
            log_error("rpc: connection %s died: %s\n", addr, e)

    # -- command handlers ------------------------------------------------------
    def _dispatch(self, cmd: int, payload: bytes) -> bytes:
        with self._lock:
            if cmd == CMD_HELLO:
                meta, _ = _unpack_json_arrays(payload)
                if meta.get("magic") != RPC_MAGIC.decode() \
                        or meta.get("version") != RPC_VERSION:
                    raise ValueError("rpc version mismatch")
                import jax
                return _pack_json_arrays(
                    {"version": RPC_VERSION,
                     "backend": jax.default_backend(),
                     "devices": [str(d) for d in jax.devices()]}, [])
            if cmd == CMD_LOAD_MODEL:
                return self._load_model(payload)
            if cmd == CMD_FULL:
                return self._full(payload)
            if cmd == CMD_ENCODE:
                return self._encode(payload)
            if cmd == CMD_GET_EMB_ENC:
                meta, _ = _unpack_json_arrays(payload)
                ctx = self._contexts[meta["ctx_id"]]
                emb = ctx.state.embd_enc
                arr = (np.zeros((0,), np.float32) if emb is None
                       else np.asarray(emb, np.float32))
                return _pack_json_arrays({"fingerprint": ctx.print_emb_enc()},
                                         [arr])
            if cmd == CMD_GET_SEGMENTS:
                meta, _ = _unpack_json_arrays(payload)
                ctx = self._contexts[meta["ctx_id"]]
                return _pack_json_arrays(
                    {"segments": _sanitize(ctx.state.segments)}, [])
            if cmd == CMD_GET_LOGITS:
                meta, _ = _unpack_json_arrays(payload)
                ctx = self._contexts[meta["ctx_id"]]
                lg = ctx.get_logits()
                arr = (np.zeros((0,), np.float32) if lg is None
                       else np.asarray(lg, np.float32))
                return _pack_json_arrays({}, [arr])
            if cmd == CMD_FREE:
                meta, _ = _unpack_json_arrays(payload)
                ctx = self._contexts.pop(meta["ctx_id"], None)
                if ctx is not None:
                    ctx.free()
                return _pack_json_arrays({}, [])
            if cmd == CMD_SYSTEM_INFO:
                from qwen2_audio_tpu.runtime.context import print_system_info
                return _pack_json_arrays({"info": print_system_info()}, [])
            raise ValueError(f"unknown rpc command {cmd}")

    def _load_model(self, payload: bytes) -> bytes:
        from qwen2_audio_tpu.runtime.context import (ContextParams,
                                                     WhisperContext)
        meta, arrays = _unpack_json_arrays(payload)
        cp = ContextParams(**meta.get("cparams", {}))
        model_bytes = arrays[0].tobytes()
        ctx = WhisperContext.init_from_buffer_with_params(model_bytes, cp)
        ctx_id = self._next_id
        self._next_id += 1
        self._contexts[ctx_id] = ctx
        return _pack_json_arrays(
            {"ctx_id": ctx_id, "n_vocab": ctx.n_vocab(),
             "n_audio_ctx": ctx.n_audio_ctx()}, [])

    def _full(self, payload: bytes) -> bytes:
        from qwen2_audio_tpu.runtime.context import FullParams
        meta, arrays = _unpack_json_arrays(payload)
        ctx = self._contexts[meta["ctx_id"]]
        fp = FullParams(**meta.get("fparams", {}))
        rc = ctx.full(fp, arrays[0].astype(np.float32))
        return _pack_json_arrays(
            {"rc": int(rc), "segments": _sanitize(ctx.state.segments)}, [])

    def _encode(self, payload: bytes) -> bytes:
        meta, _ = _unpack_json_arrays(payload)
        ctx = self._contexts[meta["ctx_id"]]
        rc = ctx.encode(meta.get("offset", 0), meta.get("audio_ctx", 0))
        return _pack_json_arrays({"rc": int(rc)}, [])


# --------------------------------------------------------------------------- #
# client
# --------------------------------------------------------------------------- #

class RpcError(RuntimeError):
    pass


class RemoteWhisperContext:
    """Client proxy with the WhisperContext surface used by the CLI —
    ≙ the reference's client-side proxy backend
    (ggml_backend_rpc_init, ggml-rpc.cpp)."""

    class _StateView:
        """Duck-types WhisperState for CLI/output-format consumers."""

        def __init__(self, owner: "RemoteWhisperContext"):
            self._owner = owner

        @property
        def segments(self) -> list[dict]:
            return self._owner.segments

    def __init__(self, sock: socket.socket, server_info: dict):
        self._sock = sock
        self._info = server_info
        self._ctx_id: int | None = None
        self.segments: list[dict] = []   # same dict schema as WhisperState
        self.state = RemoteWhisperContext._StateView(self)
        self.decoder = None              # decoder attach is local-only

    # -- connection ----------------------------------------------------------
    @classmethod
    def connect(cls, endpoint: str, timeout_s: float = 30.0
                ) -> "RemoteWhisperContext":
        host, _, port = endpoint.rpartition(":")
        sock = socket.create_connection((host or "127.0.0.1", int(port)),
                                        timeout=timeout_s)
        sock.settimeout(None)   # model load / compile can take minutes
        _send_frame(sock, CMD_HELLO, _pack_json_arrays(
            {"magic": RPC_MAGIC.decode(), "version": RPC_VERSION}, []))
        info, _ = cls._recv(sock)
        return cls(sock, info)

    @staticmethod
    def _recv(sock) -> tuple[dict, list[np.ndarray]]:
        status, payload = _recv_frame(sock)
        if status != STATUS_OK:
            raise RpcError(payload.decode(errors="replace"))
        return _unpack_json_arrays(payload)

    def _call(self, cmd: int, meta: dict, arrays: list[np.ndarray] = ()
              ) -> tuple[dict, list[np.ndarray]]:
        _send_frame(self._sock, cmd, _pack_json_arrays(meta, list(arrays)))
        return self._recv(self._sock)

    # -- API surface ----------------------------------------------------------
    @property
    def server_backend(self) -> str:
        return self._info.get("backend", "?")

    def load_model_bytes(self, model: bytes, cparams: Any = None) -> None:
        meta = {"cparams": _params_to_dict(cparams) if cparams else {}}
        resp, _ = self._call(CMD_LOAD_MODEL, meta,
                             [np.frombuffer(model, np.uint8)])
        self._ctx_id = resp["ctx_id"]

    def load_model_file(self, path: str, cparams: Any = None) -> None:
        with open(path, "rb") as f:
            self.load_model_bytes(f.read(), cparams)

    def full(self, params: Any, samples: np.ndarray) -> int:
        resp, _ = self._call(
            CMD_FULL,
            {"ctx_id": self._require(), "fparams": _params_to_dict(params)},
            [np.asarray(samples, np.float32)])
        self.segments = resp["segments"]
        return resp["rc"]

    def full_parallel(self, params: Any, samples: np.ndarray,
                      n_processors: int) -> int:
        """Chunk parallelism happens server-side through the batched
        serving decode; the proxy forwards a plain full()."""
        return self.full(params, samples)

    def encode(self, offset: int = 0, audio_ctx: int = 0) -> int:
        resp, _ = self._call(CMD_ENCODE, {"ctx_id": self._require(),
                                          "offset": offset,
                                          "audio_ctx": audio_ctx})
        return resp["rc"]

    def get_emb_enc(self) -> np.ndarray:
        _, arrays = self._call(CMD_GET_EMB_ENC,
                               {"ctx_id": self._require()})
        return arrays[0]

    def print_emb_enc(self) -> str:
        resp, _ = self._call(CMD_GET_EMB_ENC, {"ctx_id": self._require()})
        return resp["fingerprint"]

    def get_logits(self) -> np.ndarray:
        _, arrays = self._call(CMD_GET_LOGITS, {"ctx_id": self._require()})
        return arrays[0]

    def full_n_segments(self) -> int:
        return len(self.segments)

    def full_get_segment_text(self, i: int) -> str:
        return self.segments[i]["text"]

    def system_info(self) -> str:
        resp, _ = self._call(CMD_SYSTEM_INFO, {})
        return resp["info"]

    def free(self) -> None:
        if self._ctx_id is not None:
            self._call(CMD_FREE, {"ctx_id": self._ctx_id})
            self._ctx_id = None

    def close(self, shutdown_server: bool = False) -> None:
        try:
            self.free()
            if shutdown_server:
                _send_frame(self._sock, CMD_SHUTDOWN,
                            _pack_json_arrays({}, []))
                _recv_frame(self._sock)
        finally:
            self._sock.close()

    def _require(self) -> int:
        if self._ctx_id is None:
            raise RpcError("no model loaded (call load_model_* first)")
        return self._ctx_id


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser(description="qwen2-audio-tpu RPC server "
                                             "(≙ ggml-rpc server role)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=50052)
    args = ap.parse_args()
    srv = RpcServer(args.host, args.port)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
