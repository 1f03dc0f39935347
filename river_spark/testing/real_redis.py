"""Spawn a throwaway real ``redis-server`` for the interop test axis.

The Redis-wire suites default to the in-process RESP-subset server
(mini_redis) — faithful, but a normalizing reimplementation. Wherever a
stock ``redis-server`` binary exists, the SAME suites also run against a
private spawned instance (fresh port, no persistence, killed on exit),
so any semantic drift between mini_redis and real Redis surfaces as a
test failure instead of staying invisible. In environments without the
binary (like this container) the axis skips.
"""

from __future__ import annotations

import contextlib
import shutil
import socket
import subprocess
import tempfile
import time


def redis_server_binary() -> str | None:
    return shutil.which("redis-server")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@contextlib.contextmanager
def spawn_redis_server(timeout_s: float = 10.0):
    """Start a private redis-server on a free port; yield (host, port).

    No persistence (``--save '' --appendonly no``), data dir in a temp
    directory, terminated (then killed) on exit. Raises RuntimeError if
    the binary is absent — callers gate on :func:`redis_server_binary`.
    """
    binary = redis_server_binary()
    if binary is None:
        raise RuntimeError("redis-server binary not found")
    port = _free_port()
    with tempfile.TemporaryDirectory() as tmp:
        proc = subprocess.Popen(
            [binary, "--port", str(port), "--save", "", "--appendonly", "no",
             "--dir", tmp, "--bind", "127.0.0.1"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        try:
            from river_spark.transport.resp import RespClient

            deadline = time.monotonic() + timeout_s
            last_err = None
            while time.monotonic() < deadline:
                if proc.poll() is not None:
                    raise RuntimeError(f"redis-server exited rc={proc.returncode}")
                try:
                    c = RespClient("127.0.0.1", port, timeout_s=1.0)
                    c.command("PING")
                    c.close()
                    break
                except OSError as e:
                    last_err = e
                    time.sleep(0.05)
            else:
                raise RuntimeError(f"redis-server never answered PING: {last_err}")
            yield "127.0.0.1", port
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
