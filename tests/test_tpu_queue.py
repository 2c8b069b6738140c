"""tools/tpu_queue.py: outage-resilient sequential job queue.

CPU-only: the probe is swapped for plain shell commands, so these tests
exercise the wait/marker/timeout machinery without a TPU (the default probe
runs a real jax matmul in a killable subprocess — the only liveness signal
that catches the observed half-dead-relay mode, where connect succeeds but
the remote leg is down; see CLAUDE.md / bench.py::_wait_for_backend).
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from tpu_queue import QueueLockedError, run_queue  # noqa: E402


def _plan(steps, probe="true"):
    return {"steps": steps, "probe": probe, "probe_timeout": 5}


def test_runs_steps_and_drops_markers(tmp_path):
    out = tmp_path / "touched"
    plan = _plan([
        {"name": "a", "cmd": f"echo one > {out}", "timeout": 30},
        {"name": "b", "cmd": f"echo two >> {out}", "timeout": 30},
    ])
    done, skipped, failed, pending = run_queue(plan, str(tmp_path / "marks"), 60)
    assert done == ["a", "b"] and not skipped and not failed
    assert out.read_text() == "one\ntwo\n"
    assert (tmp_path / "marks" / "a.done").exists()
    # per-step output is captured next to the marker
    assert (tmp_path / "marks" / "a.log").exists()


def test_resume_skips_completed_steps(tmp_path):
    out = tmp_path / "touched"
    plan = _plan([{"name": "a", "cmd": f"echo ran >> {out}", "timeout": 30}])
    marks = str(tmp_path / "marks")
    run_queue(plan, marks, 60)
    done, skipped, failed, pending = run_queue(plan, marks, 60)
    assert skipped == ["a"] and not done and not failed
    assert out.read_text() == "ran\n"  # did NOT run twice


def test_failed_step_continues_queue_without_marker(tmp_path):
    plan = _plan([
        {"name": "bad", "cmd": "exit 7", "timeout": 30},
        {"name": "good", "cmd": "true", "timeout": 30},
    ])
    done, skipped, failed, pending = run_queue(plan, str(tmp_path / "marks"), 60)
    assert failed == ["bad"] and done == ["good"]
    assert not (tmp_path / "marks" / "bad.done").exists()


def test_step_timeout_kills_and_marks_failed(tmp_path):
    plan = _plan([{"name": "hang", "cmd": "sleep 60", "timeout": 1}])
    done, skipped, failed, pending = run_queue(plan, str(tmp_path / "marks"), 60)
    assert failed == ["hang"] and not done


def test_dead_backend_aborts_within_budget(tmp_path):
    # probe always fails -> queue gives up inside the budget, runs nothing
    out = tmp_path / "touched"
    plan = _plan([{"name": "a", "cmd": f"touch {out}", "timeout": 30}],
                 probe="false")
    done, skipped, failed, pending = run_queue(plan, str(tmp_path / "marks"), 2,
                                      sleep_s=1)
    assert pending == ["a"] and not failed and not out.exists()


def test_hung_probe_is_killed_not_waited(tmp_path):
    # a probe that HANGS (the observed dead-tunnel mode) must be bounded by
    # probe_timeout, not block forever
    plan = {"steps": [{"name": "a", "cmd": "true", "timeout": 30}],
            "probe": "sleep 60", "probe_timeout": 1}
    done, skipped, failed, pending = run_queue(plan, str(tmp_path / "marks"), 2,
                                      sleep_s=1)
    assert pending == ["a"] and not failed


def test_pending_lists_every_unattempted_step(tmp_path):
    # outage before step 2: steps 2..N must all be reported, not just the
    # first — the summary has to account for the whole plan
    marks = tmp_path / "marks"
    marks.mkdir()
    (marks / "a.done").write_text("0s\n")
    plan = {"steps": [{"name": "a", "cmd": "true"},
                      {"name": "b", "cmd": "true"},
                      {"name": "c", "cmd": "true"}],
            "probe": "false", "probe_timeout": 5}
    done, skipped, failed, pending = run_queue(plan, str(marks), 2, sleep_s=1)
    assert skipped == ["a"] and pending == ["b", "c"] and not failed


def test_timeout_kills_whole_process_group(tmp_path):
    # the step is `sh -c "<compound>"`: killing only the shell would orphan
    # the real workload (a second TPU process contending with the next step)
    pidfile = tmp_path / "child.pid"
    plan = _plan([{"name": "hang",
                   "cmd": f"sleep 60 & echo $! > {pidfile}; wait",
                   "timeout": 2}])
    done, skipped, failed, pending = run_queue(plan, str(tmp_path / "marks"),
                                               60)
    assert failed == ["hang"]
    child = int(pidfile.read_text().strip())
    import time
    for _ in range(20):  # give SIGKILL a moment to land
        if not os.path.exists(f"/proc/{child}"):
            break
        time.sleep(0.1)
    assert not os.path.exists(f"/proc/{child}"), "workload survived the kill"


def test_second_instance_refused_while_holder_alive(tmp_path):
    # the round-4 contamination mode: a second sequencer launched against the
    # same marks dir while the first is mid-step -> both run TPU steps
    # concurrently. The LOCK file must make the second one refuse.
    marks = tmp_path / "marks"
    marks.mkdir()
    (marks / "LOCK").write_text(str(os.getpid()))  # a live holder (us)
    plan = _plan([{"name": "a", "cmd": "true", "timeout": 30}])
    with pytest.raises(QueueLockedError):
        run_queue(plan, str(marks), 60)
    assert (marks / "LOCK").read_text() == str(os.getpid())  # not stolen


def test_stale_lock_is_stolen_and_released(tmp_path):
    marks = tmp_path / "marks"
    marks.mkdir()
    dead = subprocess.Popen(["true"])
    dead.wait()
    (marks / "LOCK").write_text(str(dead.pid))
    plan = _plan([{"name": "a", "cmd": "true", "timeout": 30}])
    done, skipped, failed, pending = run_queue(plan, str(marks), 60)
    assert done == ["a"]
    assert not (marks / "LOCK").exists()  # released on completion


def test_lock_released_even_when_a_step_fails(tmp_path):
    marks = tmp_path / "marks"
    plan = _plan([{"name": "bad", "cmd": "exit 3", "timeout": 30}])
    run_queue(plan, str(marks), 60)
    assert not (marks / "LOCK").exists()


def test_marker_appearing_during_backend_wait_skips_step(tmp_path):
    # a step completed elsewhere while this queue waited out an outage must
    # not be re-run: the probe itself drops the marker, simulating the
    # legacy runner finishing during the wait
    marks = tmp_path / "marks"
    marks.mkdir()
    out = tmp_path / "touched"
    plan = {"steps": [{"name": "a", "cmd": f"touch {out}", "timeout": 30}],
            "probe": f"touch {marks}/a.done", "probe_timeout": 5}
    done, skipped, failed, pending = run_queue(plan, str(marks), 60)
    assert skipped == ["a"] and not done and not failed
    assert not out.exists()


def test_cli_refuses_when_locked(tmp_path):
    marks = tmp_path / "marks"
    marks.mkdir()
    (marks / "LOCK").write_text(str(os.getpid()))
    plan_file = tmp_path / "plan.json"
    plan_file.write_text(json.dumps(_plan(
        [{"name": "a", "cmd": "echo hi", "timeout": 30}])))
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "tpu_queue.py"),
         str(plan_file), "--marks", str(marks), "--budget-hours", "0.01"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 2
    assert "REFUSED" in r.stderr


def test_cli_end_to_end(tmp_path):
    plan_file = tmp_path / "plan.json"
    plan_file.write_text(json.dumps(_plan(
        [{"name": "a", "cmd": "echo hi", "timeout": 30}])))
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "tpu_queue.py"),
         str(plan_file), "--marks", str(tmp_path / "marks"),
         "--budget-hours", "0.01"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary == {"done": ["a"], "skipped": [], "failed": [],
                       "pending": []}
    assert "hi" in (tmp_path / "marks" / "a.log").read_text()
