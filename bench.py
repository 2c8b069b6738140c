"""Benchmark: 3DPW-protocol eval throughput (clips/sec/chip) on the flagship
MAED ste-parallel + KTD model at the release eval shape (16-frame 224x224
clips -> SMPL verts/joints/2D reprojection, J14 regressor path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
is the ratio against the round-1 recorded value in BENCH_SELF.json (1.0 when
that file doesn't exist yet, i.e. this run defines the baseline).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from maed_tpu.models import MAED
    from maed_tpu.ops.joints import H36M_TO_J14  # noqa: F401 (protocol doc)
    from maed_tpu.utils.smpl_io import find_smpl_model

    dtype = jnp.bfloat16 if os.environ.get("MAED_BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    from maed_tpu.utils.checkpoint import fold_weight_standardization

    batch = int(os.environ.get("MAED_BENCH_BATCH", "8"))
    seqlen = 16
    model = MAED(encoder="ste", num_blocks=6, num_heads=12, st_mode="parallel",
                 decoder="ktd", hidden_dim=1024, standardize_ws=False, dtype=dtype)
    smpl = find_smpl_model()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, seqlen, 224, 224, 3).astype(np.float32))
    J_reg = jnp.asarray(rng.rand(14, smpl.v_template.shape[0]).astype(np.float32))

    print(f"[bench] device={jax.devices()[0]}, batch={batch}, dtype={dtype.__name__}",
          file=sys.stderr)
    variables = model.init(jax.random.PRNGKey(0), x[:1, :2], smpl)
    variables = {"params": fold_weight_standardization(variables["params"])}

    fwd = jax.jit(lambda v, images: model.apply(v, images, smpl, J_regressor=J_reg))

    # compile + warmup
    out = fwd(variables, x)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fwd(variables, x)
    jax.block_until_ready(out)
    warm = time.time() - t0
    iters = max(3, int(10.0 / max(warm, 1e-3)))
    iters = min(iters, 50)

    from maed_tpu.utils.timing import fetch_sync

    def measure():
        t0 = time.time()
        for _ in range(iters):
            out = fwd(variables, x)
        fetch_sync(out)  # block_until_ready can return early over the tunnel
        return batch * iters / (time.time() - t0)

    # two passes, report the steady-state (max) — the first pass after an
    # idle period occasionally runs ~15% slow (tunnel/chip warmup)
    clips_per_sec = max(measure(), measure())
    print(f"[bench] {iters} iters x2 -> {clips_per_sec:.2f} clips/s",
          file=sys.stderr)

    vs_baseline = 1.0
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json")
    if os.path.isfile(base_file):
        with open(base_file) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = clips_per_sec / float(base["value"])
    else:
        with open(base_file, "w") as f:
            json.dump({"value": clips_per_sec, "unit": "clips/sec/chip"}, f)

    print(json.dumps({
        "metric": "3dpw_eval_throughput",
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))


def _wait_for_backend():
    """The axon tunnel can be transiently down (observed: ~1h outage after a
    killed long remote compile), and a dead tunnel can either raise OR hang
    backend init indefinitely. Probe it in a killable subprocess and wait it
    out (bounded), so an unattended bench run survives the outage."""
    import subprocess

    # default budget ~85 min (probe <=240s + 180s sleep per cycle): the one
    # observed tunnel outage lasted ~1h, so 6 cycles (~42 min) was too tight
    retries = int(os.environ.get("MAED_BENCH_RETRIES", "12"))
    for i in range(retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=240, capture_output=True,
            )
            if r.returncode == 0:
                return
            reason = (r.stderr or b"").decode(errors="replace")[-200:]
        except subprocess.TimeoutExpired:
            reason = "backend init hung >240s"
        if i == retries:
            # a dead tunnel HANGS backend init rather than raising, so
            # proceeding to main() would hang the driver — exit loudly
            print(f"[bench] backend still unavailable after {retries} "
                  f"retries: {reason}", file=sys.stderr)
            sys.exit(3)
        print(f"[bench] backend unavailable ({reason.strip()}); "
              f"retry {i + 1}/{retries} in 180s", file=sys.stderr)
        time.sleep(180)


if __name__ == "__main__":
    _wait_for_backend()
    main()
