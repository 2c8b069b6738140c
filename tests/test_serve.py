"""Serving host (serve.py): artifact -> ModelHost -> HTTP round-trip.

Covers both artifact flavors (baked constants and args-mode + params.npz),
the pad-to-compiled-batch/trim contract, and the HTTP protocol (healthz,
npy-in/npz-out predict, 400 on bad shapes) against a live ThreadingHTTPServer
on a loopback port.
"""

import http.client
import io
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maed_tpu.models import MAED
from maed_tpu.utils.export import export_eval_forward
from maed_tpu.utils.smpl_io import synthetic_smpl_model

from serve import OUT_KEYS, ModelHost, ThreadingHTTPServer, make_handler


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    smpl = synthetic_smpl_model(num_verts=120)
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    x = np.random.RandomState(0).randn(2, 4, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), smpl)

    baked = tmp / "baked.hlo"
    baked.write_bytes(export_eval_forward(
        model, variables, smpl, batch_size=2, seqlen=4, height=32, width=32,
        platforms=("cpu",)))

    argsmode = tmp / "args.hlo"
    blob, flat = export_eval_forward(
        model, variables, smpl, batch_size=2, seqlen=4, height=32, width=32,
        platforms=("cpu",), bake_params=False)
    argsmode.write_bytes(blob)
    np.savez(str(argsmode) + ".params.npz", **flat)

    want = jax.tree.map(
        np.asarray,
        model.apply(variables, jnp.asarray(x), smpl, deterministic=True))
    return str(baked), str(argsmode), x, want


@pytest.mark.parametrize("flavor", ["baked", "argsmode"])
def test_model_host_matches_direct(artifacts, flavor):
    baked, argsmode, x, want = artifacts
    host = ModelHost(baked if flavor == "baked" else argsmode)
    assert host.spec()["batch"] == 2 and host.spec()["seqlen"] == 4
    got = host.predict(x)
    for k in OUT_KEYS:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-2, atol=1e-4,
                                   err_msg=k)


def test_model_host_pads_and_trims(artifacts):
    baked, _, x, want = artifacts
    host = ModelHost(baked)
    got = host.predict(x[:1])  # B=1 < compiled batch 2
    assert got["theta"].shape[0] == 1
    np.testing.assert_allclose(got["theta"], want["theta"][:1],
                               rtol=2e-2, atol=1e-4)
    with pytest.raises(ValueError):
        host.predict(np.zeros((3, 4, 32, 32, 3), np.float32))  # B > batch
    with pytest.raises(ValueError):
        host.predict(np.zeros((1, 4, 16, 16, 3), np.float32))  # wrong HW


def test_http_round_trip(artifacts):
    baked, _, x, want = artifacts
    host = ModelHost(baked)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(host))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["batch"] == 2

        buf = io.BytesIO()
        np.save(buf, x)
        conn.request("POST", "/predict", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 200
        preds = np.load(io.BytesIO(r.read()))
        for k in OUT_KEYS:
            np.testing.assert_allclose(preds[k], want[k], rtol=2e-2,
                                       atol=1e-4, err_msg=k)

        # protocol errors surface as 400s, not dead connections
        buf = io.BytesIO()
        np.save(buf, np.zeros((5, 4, 32, 32, 3), np.float32))
        conn.request("POST", "/predict", body=buf.getvalue())
        assert conn.getresponse().status == 400
    finally:
        server.shutdown()
        server.server_close()


def test_bucketed_host_routes_by_batch(artifacts, tmp_path):
    from serve import BucketedHost

    baked2, _, x, want = artifacts
    # a second bucket with batch 1, same model/weights
    smpl = synthetic_smpl_model(num_verts=120)
    model = MAED(encoder="ste", num_blocks=1, num_heads=2, st_mode="parallel",
                 decoder="ktd", hidden_dim=32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), smpl)
    baked1 = tmp_path / "b1.hlo"
    baked1.write_bytes(export_eval_forward(
        model, variables, smpl, batch_size=1, seqlen=4, height=32, width=32,
        platforms=("cpu",)))

    host = BucketedHost([str(baked1), baked2])
    assert host.spec()["buckets"] == [1, 2]

    # n=1 routes to the batch-1 bucket (no padding), n=2 to the batch-2 one
    got1 = host.predict(x[:1])
    got2 = host.predict(x)
    # NOTE: weights here are freshly initialized with the same seed/shapes as
    # the module fixture, so outputs must match the fixture's direct apply
    np.testing.assert_allclose(got1["theta"], want["theta"][:1],
                               rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(got2["theta"], want["theta"],
                               rtol=2e-2, atol=1e-4)
    with pytest.raises(ValueError):
        host.predict(np.zeros((3, 4, 32, 32, 3), np.float32))
