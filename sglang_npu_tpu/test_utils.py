"""Shared test/eval harness utilities (reference
`python/sglang/test/test_utils.py`: `popen_launch_server:462`,
`kill_process_tree`)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
import urllib.request

DEFAULT_URL_FOR_TEST = "http://127.0.0.1:31157"


def popen_launch_server(
    model_path: str,
    base_url: str = DEFAULT_URL_FOR_TEST,
    timeout: float = 600.0,
    other_args: tuple = (),
    env: dict = None,
) -> subprocess.Popen:
    """Launch the HTTP server as a subprocess and wait for /health."""
    host, port = base_url.replace("http://", "").split(":")
    cmd = [
        sys.executable,
        "-m",
        "sglang_npu_tpu.launch_server",
        "--model-path",
        model_path,
        "--host",
        host,
        "--port",
        port,
        *other_args,
    ]
    # own session/process-group: kill_process_tree uses killpg and must not
    # take the parent (test) process down with the server
    proc = subprocess.Popen(cmd, env=env or os.environ.copy(), start_new_session=True)
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(base_url + "/health", timeout=5) as r:
                if r.status == 200:
                    return proc
        except Exception:
            pass
        if proc.poll() is not None:
            raise RuntimeError(f"server exited early with {proc.returncode}")
        time.sleep(1)
    kill_process_tree(proc.pid)
    raise TimeoutError("server did not become healthy")


def kill_process_tree(pid: int):
    """Kill a process group by exact pid (never by pattern)."""
    try:
        os.killpg(os.getpgid(pid), signal.SIGTERM)
    except (ProcessLookupError, PermissionError):
        try:
            os.kill(pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
