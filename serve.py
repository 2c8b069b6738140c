"""Serving host: an HTTP inference server over an exported StableHLO artifact.

`utils/export.py` produces the artifact (params baked, or args-mode with a
`.params.npz` side-file); this host is the deployment endpoint around it —
stdlib-only (http.server), no flax/model/checkpoint code in the serving
process. The reference has no serving analogue (its eval path re-builds the
torch model from source per run, /root/reference/eval.py:16-35).

    python -m maed_tpu.utils.export --cfg ... --checkpoint ... --out m.hlo
    python serve.py --artifact m.hlo --port 8700

Protocol (shapes are static, TPU-native — one artifact per (batch, seqlen)):
  GET  /healthz  -> JSON {batch, seqlen, height, width, platforms}
  POST /predict  -> body: .npy bytes, images (B, T, H, W, 3) float32,
                    ImageNet-normalized like eval.py's input pipeline.
                    B <= exported batch (the host pads to the compiled shape
                    and trims the response). Response: .npz bytes with
                    theta (B,T,85), verts, kp_2d, kp_3d, rotmat.

Dispatch is serialized with a lock: one compiled executable, one device —
concurrency should come from batch packing (export a bigger batch), not from
racing dispatches. Measured on v5e: the flagship args-mode artifact serves
at ~160 clips/s, ~1% over the direct jitted forward (doc/design.md).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from maed_tpu.utils.platform import honor_env_platform

honor_env_platform()

from maed_tpu.utils.export import load_exported  # noqa: E402

OUT_KEYS = ("theta", "verts", "kp_2d", "kp_3d", "rotmat")


class ModelHost:
    """Loads the artifact, owns the single dispatch lock, pads/trims batch."""

    def __init__(self, artifact_path: str, params_path: str = ""):
        with open(artifact_path, "rb") as f:
            self.fwd = load_exported(f.read())
        self.params = None
        if len(self.fwd.in_avals) > 1:  # args-mode artifact
            params_path = params_path or artifact_path + ".params.npz"
            self.params = dict(np.load(params_path))
        img_aval = self.fwd.in_avals[-1]
        self.batch, self.seqlen, self.height, self.width = img_aval.shape[:4]
        # u8 artifacts (export --input_dtype u8) take raw uint8 crops and
        # normalize in-graph: clients POST 1/4 the bytes; pad in kind
        self.img_dtype = np.dtype(str(img_aval.dtype))
        self._lock = threading.Lock()

    def spec(self) -> dict:
        return {
            "batch": int(self.batch), "seqlen": int(self.seqlen),
            "height": int(self.height), "width": int(self.width),
            "dtype": self.img_dtype.name,
            "platforms": list(self.fwd.platforms),
        }

    def warmup(self):
        self.predict(np.zeros(
            (1, self.seqlen, self.height, self.width, 3), self.img_dtype))

    def predict(self, images: np.ndarray) -> dict:
        want = (self.seqlen, self.height, self.width, 3)
        if images.ndim != 5 or images.shape[1:] != want:
            raise ValueError(
                f"images must be (B<={self.batch}, {want[0]}, {want[1]}, "
                f"{want[2]}, 3), got {images.shape}")
        n = images.shape[0]
        if not 1 <= n <= self.batch:
            raise ValueError(f"batch {n} outside [1, {self.batch}]")
        if n < self.batch:  # pad to the compiled static shape
            pad = np.zeros((self.batch - n,) + want, self.img_dtype)
            images = np.concatenate([images.astype(self.img_dtype), pad], axis=0)
        with self._lock:
            out = (self.fwd(self.params, images) if self.params is not None
                   else self.fwd(images))
        return {k: np.asarray(out[k])[:n] for k in OUT_KEYS}


class BucketedHost:
    """Routes each request to the smallest exported batch that fits.

    TPU-native static shapes mean one compiled program per (batch, seqlen);
    exporting several batch sizes (utils/export.py docstring's 'bucketed
    server') keeps small requests from paying the big batch's latency.
    """

    def __init__(self, artifact_paths, params_path: str = ""):
        hosts = [ModelHost(p, params_path) for p in artifact_paths]
        self.hosts = sorted(hosts, key=lambda h: h.batch)
        ref = self.hosts[0].spec()
        for h in self.hosts[1:]:
            s = h.spec()
            if {k: s[k] for k in ("seqlen", "height", "width")} != \
               {k: ref[k] for k in ("seqlen", "height", "width")}:
                raise ValueError(f"bucket specs differ beyond batch: {s} vs {ref}")
        self.batch = self.hosts[-1].batch
        self.seqlen, self.height, self.width = (
            self.hosts[-1].seqlen, self.hosts[-1].height, self.hosts[-1].width)

    def spec(self) -> dict:
        top = self.hosts[-1].spec()
        top["buckets"] = [h.batch for h in self.hosts]
        return top

    def warmup(self):
        for h in self.hosts:
            h.warmup()

    def predict(self, images: np.ndarray) -> dict:
        n = images.shape[0] if getattr(images, "ndim", 0) >= 1 else 0
        for h in self.hosts:
            if n <= h.batch:
                return h.predict(images)
        return self.hosts[-1].predict(images)  # raises the clear batch error


def make_handler(host: ModelHost, ready=None):
    """ready: optional threading.Event — until set, /healthz reports
    {"ready": false} and /predict answers 503 (warmup in progress)."""
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; the CLI prints the endpoint once
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                spec = dict(host.spec())
                spec["ready"] = ready is None or ready.is_set()
                self._send(200, json.dumps(spec).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            if ready is not None and not ready.is_set():
                self._send(503, b"warming up", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                images = np.load(io.BytesIO(self.rfile.read(n)),
                                 allow_pickle=False)
                preds = host.predict(np.asarray(images))
                buf = io.BytesIO()
                np.savez(buf, **preds)
                self._send(200, buf.getvalue(), "application/octet-stream")
            except ValueError as e:
                self._send(400, str(e).encode(), "text/plain")
            except Exception as e:  # noqa: BLE001 — serving loop must survive
                self._send(500, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")

    return Handler


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifact", required=True, nargs="+",
                    help="StableHLO artifact(s) from maed_tpu.utils.export; "
                    "several -> a bucketed server routing each request to "
                    "the smallest exported batch that fits")
    ap.add_argument("--params", default="",
                    help="args-mode .params.npz (default: <artifact>.params.npz)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    args = ap.parse_args()

    host = (ModelHost(args.artifact[0], args.params)
            if len(args.artifact) == 1
            else BucketedHost(args.artifact, args.params))
    print(f"loaded {args.artifact}: {host.spec()}")

    # bind + answer /healthz immediately; predict 503s until warmup finishes
    ready = threading.Event()
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(host, ready))
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          "(warming up)")
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host.warmup()
    ready.set()
    print("warmup dispatch done — ready")

    stop = threading.Event()

    def _graceful(signum, frame):
        stop.set()

    import signal

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)

    stop.wait()
    server.shutdown()
    server.server_close()
    print("shut down")


if __name__ == "__main__":
    main()
