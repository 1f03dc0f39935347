"""Minimal RESP2 client over a TCP socket.

The reference transport speaks the open Redis Serialization Protocol via
hiredis (``/root/reference/cpp/src/redis.cpp:24-61`` builds the
connection; every operation is a formatted command + reply). No redis
client library ships in this environment, so this is a small, dependency
-free implementation of the same public protocol: commands are arrays of
bulk strings, replies are the five RESP2 types. Supports pipelining
(``send_many`` + ``read_reply`` per command) — the batch XADD hot path
sends a whole batch of commands before reading any reply, exactly like
the reference writer's send-then-drain loop
(``cpp/src/writer.cpp:328-353``).

Binary safety: arguments and bulk replies are ``bytes`` end-to-end;
callers decode the fields they know are text.
"""

from __future__ import annotations

import socket


class RespError(RuntimeError):
    """Server-side -ERR reply."""


class RespConnectionError(ConnectionError):
    pass


def _encode_command(args: tuple) -> bytes:
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        if isinstance(a, str):
            a = a.encode()
        elif isinstance(a, int):
            a = b"%d" % a
        elif isinstance(a, (bytearray, memoryview)):
            a = bytes(a)
        out.append(b"$%d\r\n" % len(a))
        out.append(a)
        out.append(b"\r\n")
    return b"".join(out)


class RespClient:
    """One TCP connection. Not thread-safe; callers hold one per thread."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6379,
                 password: str | None = None, timeout_s: float = 30.0):
        self.host, self.port = host, port
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        # bytearray accumulator: `bytes += chunk` would copy the whole
        # growing buffer per recv — O(n²) bytes copied while reading one
        # multi-MB framed batch_val reply
        self._buf = bytearray()
        if password:
            self.command("AUTH", password)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    # -- wire ----------------------------------------------------------------
    def send_many(self, commands: list[tuple]) -> None:
        """Pipeline: write all commands without waiting for replies."""
        payload = b"".join(_encode_command(c) for c in commands)
        self._sock.sendall(payload)

    def command(self, *args):
        self.send_many([args])
        return self.read_reply()

    def _read_line(self) -> bytes:
        while True:
            i = self._buf.find(b"\r\n")
            if i >= 0:
                line = bytes(self._buf[:i])
                del self._buf[: i + 2]
                return line
            chunk = self._sock.recv(65536)
            if not chunk:
                raise RespConnectionError("connection closed by server")
            self._buf += chunk

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise RespConnectionError("connection closed by server")
            self._buf += chunk
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def read_reply(self):
        line = self._read_line()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest
        if kind == b"-":
            raise RespError(rest.decode(errors="replace"))
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return None
            data = self._read_exact(n)
            self._read_exact(2)  # trailing \r\n
            return data
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self.read_reply() for _ in range(n)]
        raise RespConnectionError(f"unexpected RESP type byte {kind!r}")
