"""Import health: every module in the package imports cleanly (no hidden
deps, no backend initialization at import time), and every CLI parses
--help."""

import importlib
import pkgutil
import subprocess
import sys

import maed_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(maed_tpu.__path__, prefix="maed_tpu."):
        if mod.name.endswith("libclip_ops"):  # ctypes .so, not a Python module
            continue
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_clis_parse_help():
    for cli in ("train.py", "eval.py", "visualize.py", "demo.py", "serve.py"):
        r = subprocess.run(
            [sys.executable, cli, "--help"], capture_output=True, text=True,
            cwd="/root/repo",
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
            timeout=300,
        )
        assert r.returncode == 0, (cli, r.stderr[-500:])
        assert "usage" in r.stdout.lower()


def test_preprocessor_clis_parse_help():
    for mod in ("threedpw", "mpii3d", "posetrack", "penn_action", "insta"):
        r = subprocess.run(
            [sys.executable, "-m", f"maed_tpu.data.preprocess.{mod}", "--help"],
            capture_output=True, text=True, cwd="/root/repo",
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
            timeout=300,
        )
        assert r.returncode == 0, (mod, r.stderr[-500:])
