"""End-to-end serving benchmark: HTTP client -> serve.py host -> device.

Measures what a serving deployment actually delivers — npy request
serialization, the HTTP hop, ModelHost dispatch, npz response — on top of
the raw executable throughput that bench.py / doc/design.md report (the
flagship args-mode artifact runs ~160 clips/s through Exported.call on v5e).

    python -m maed_tpu.utils.export --cfg ... --checkpoint ... --out m.hlo \
        --no_bake
    python tools/bench_serve.py --artifact m.hlo

Prints one JSON line: {"metric": "serve_clips_per_s", ...}.
"""

import argparse
import http.client
import io
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")  # repo root (serve.py)

from maed_tpu.utils.platform import honor_env_platform

honor_env_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--params", default="")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from serve import ModelHost, ThreadingHTTPServer, make_handler

    host = ModelHost(args.artifact, args.params)
    spec = host.spec()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(host))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    images = rng.randn(spec["batch"], spec["seqlen"], spec["height"],
                       spec["width"], 3).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, images)
    body = buf.getvalue()

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)

    def once():
        conn.request("POST", "/predict", body=body)
        r = conn.getresponse()
        payload = r.read()
        assert r.status == 200, payload[:200]
        return payload

    for _ in range(args.warmup):
        once()
    lat = []
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s = time.perf_counter()
        once()
        lat.append(time.perf_counter() - s)
    wall = time.perf_counter() - t0
    server.shutdown()

    clips = spec["batch"] * args.iters / wall
    print(json.dumps({
        "metric": "serve_clips_per_s",
        "value": round(clips, 2),
        "unit": "clips/s",
        "median_latency_ms": round(1000 * float(np.median(lat)), 2),
        "p90_latency_ms": round(1000 * float(np.percentile(lat, 90)), 2),
        "batch": spec["batch"], "seqlen": spec["seqlen"],
        "request_bytes": len(body),
    }))


if __name__ == "__main__":
    main()
