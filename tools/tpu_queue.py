"""Outage-resilient sequential job queue for the TPU backend.

The operational hazard this tool exists for: the remote TPU tunnel can die
for hours at a time, and a dead tunnel HANGS `jax.devices()` rather than
raising (see bench.py::_wait_for_backend and CLAUDE.md). Any unattended
measurement or training session therefore needs (a) a bounded liveness
probe that runs REAL device work in a killable subprocess, (b) wait-and-
retry across the outage, and (c) marker-based resume so a relaunch skips
completed steps. This generalizes the pattern the per-round measurement
sessions use; on a real pod the same shape covers preemption/maintenance
windows.

Usage:
    python tools/tpu_queue.py plan.json [--marks DIR] [--budget-hours H]

plan.json: {"steps": [{"name": ..., "cmd": ..., "timeout": seconds}, ...],
            "probe": optional shell command overriding the default jax
                     matmul probe (exit 0 = backend usable),
            "probe_timeout": seconds (default 300)}

Rules enforced: steps run strictly one at a time (two TPU processes contend
~2x, CLAUDE.md), each under its own timeout; the backend is re-probed before
every step (the tunnel can die mid-session); a failed step does NOT abort
the queue (later steps may not need whatever broke); a step succeeds iff
rc==0, which drops `<marks>/<name>.done` so relaunches are idempotent.

Single-instance lock: `<marks>/LOCK` holds the running queue's pid. A second
queue on the same marks dir refuses to start while the holder is alive and
steals the lock if it is dead. Observed failure this prevents (round 4): a
relaunched session started a second queue against the same marks dir while
the first was mid-step — both sequencers ran TPU steps concurrently and
every timing they produced was contaminated. Markers are also RE-checked
after each backend wait, so a step completed elsewhere during a long outage
is not re-run.
"""

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_PROBE = (
    f"{sys.executable} -c \"import jax, jax.numpy as jnp; "
    "x = jnp.ones((128,128), jnp.bfloat16); print(float((x@x).sum()))\""
)


def _log(logf, msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    if logf:
        with open(logf, "a") as f:
            f.write(line + "\n")


def _kill_group(proc):
    """Kill the step's WHOLE process group. proc is `sh -c <cmd>`: killing
    only the shell orphans the actual workload (e.g. a hung bench under a
    compound `a || b` command), which would then contend with the next step —
    exactly the two-TPU-processes-at-once failure this queue exists to
    prevent."""
    import signal

    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        proc.kill()
    proc.wait()


class QueueLockedError(RuntimeError):
    """Another live queue instance owns this marks dir."""


def _pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _acquire_lock(marks, logf):
    """Create <marks>/LOCK with our pid, or raise if a live holder exists.

    Best-effort (pid files race in theory), but it deterministically stops
    the observed failure mode: an operator or supervisor launching a second
    queue against a marks dir whose first queue is still running."""
    path = os.path.join(marks, "LOCK")
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(str(os.getpid()))
            return path
        except FileExistsError:
            try:
                with open(path) as f:
                    holder = int(f.read().strip() or "0")
            except (OSError, ValueError):
                holder = 0
            if holder and _pid_alive(holder):
                raise QueueLockedError(
                    f"queue already running on {marks} (pid {holder}); "
                    "refusing to start a second sequencer — two TPU "
                    "processes at once contaminate every measurement")
            _log(logf, f"stale lock (pid {holder} dead) — stealing")
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass


def backend_up(probe, probe_timeout, cwd):
    """Bounded probe with REAL device work: a half-dead relay still accepts
    connections (the local leg listens through an outage), so only completed
    work proves the remote leg is alive."""
    proc = subprocess.Popen(["sh", "-c", probe], cwd=cwd,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)
    try:
        return proc.wait(timeout=probe_timeout) == 0
    except subprocess.TimeoutExpired:
        # a dead tunnel HANGS backend init — reap the whole group, or one
        # hung jax process piles up per probe cycle across a long outage
        _kill_group(proc)
        return False


def wait_for_backend(probe, probe_timeout, budget_s, sleep_s, logf, cwd):
    t0 = time.time()
    n = 0
    while True:
        n += 1
        if backend_up(probe, probe_timeout, cwd):
            _log(logf, f"backend up (probe {n}, {time.time() - t0:.0f}s)")
            return True
        if time.time() - t0 + sleep_s >= budget_s:
            _log(logf, f"backend still down after {n} probes "
                       f"({time.time() - t0:.0f}s) — budget exhausted")
            return False
        _log(logf, f"backend down (probe {n}); sleeping {sleep_s}s")
        time.sleep(sleep_s)


def run_queue(plan, marks, budget_s, logf=None, cwd=None, sleep_s=600):
    """Returns (completed, skipped, failed, pending) step-name lists.

    pending = steps never attempted because the backend outage outlasted
    the budget — reported explicitly so the final summary always accounts
    for every step in the plan."""
    os.makedirs(marks, exist_ok=True)
    lock = _acquire_lock(marks, logf)
    try:
        return _run_queue_locked(plan, marks, budget_s, logf, cwd, sleep_s)
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


def _run_queue_locked(plan, marks, budget_s, logf, cwd, sleep_s):
    probe = plan.get("probe", DEFAULT_PROBE)
    probe_timeout = plan.get("probe_timeout", 300)
    done, skipped, failed, pending = [], [], [], []
    steps = list(plan["steps"])
    for i, step in enumerate(steps):
        name, cmd = step["name"], step["cmd"]
        tmo = step.get("timeout")
        mark = os.path.join(marks, name + ".done")
        if os.path.exists(mark):
            _log(logf, f"skip {name} (marker exists)")
            skipped.append(name)
            continue
        if not wait_for_backend(probe, probe_timeout, budget_s, sleep_s,
                                logf, cwd):
            pending = [s["name"] for s in steps[i:]]
            _log(logf, f"abort: backend never came up; never attempted: "
                       f"{pending}")
            break
        if os.path.exists(mark):
            # completed elsewhere (pre-lock legacy runner / manual run)
            # while we waited out the outage — don't run it twice
            _log(logf, f"skip {name} (marker appeared during wait)")
            skipped.append(name)
            continue
        _log(logf, f"start {name}: {cmd}")
        t0 = time.time()
        steplog = os.path.join(marks, name + ".log")
        with open(steplog, "w") as out:
            proc = subprocess.Popen(["sh", "-c", cmd], cwd=cwd, stdout=out,
                                    stderr=subprocess.STDOUT,
                                    start_new_session=True)
            try:
                rc = proc.wait(timeout=tmo)
            except subprocess.TimeoutExpired:
                _kill_group(proc)
                rc = -9
        dt = time.time() - t0
        _log(logf, f"done {name}: rc={rc} in {dt:.0f}s (log: {steplog})")
        if rc == 0:
            with open(mark, "w") as f:
                f.write(f"{dt:.0f}s\n")
            done.append(name)
        else:
            failed.append(name)
    return done, skipped, failed, pending


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("plan", help="JSON plan file (see module docstring)")
    ap.add_argument("--marks", default="/tmp/tpu_queue_marks")
    ap.add_argument("--budget-hours", type=float, default=10.5,
                    help="max wait for the backend before each step")
    ap.add_argument("--sleep", type=int, default=600,
                    help="seconds between liveness probes")
    ap.add_argument("--log", default="")
    ap.add_argument("--cwd", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()
    with open(args.plan) as f:
        plan = json.load(f)
    try:
        done, skipped, failed, pending = run_queue(
            plan, args.marks, args.budget_hours * 3600,
            logf=args.log or None, cwd=args.cwd, sleep_s=args.sleep)
    except QueueLockedError as e:
        print(f"REFUSED: {e}", file=sys.stderr)
        sys.exit(2)
    print(json.dumps({"done": done, "skipped": skipped, "failed": failed,
                      "pending": pending}))
    sys.exit(1 if failed or pending else 0)


if __name__ == "__main__":
    main()
