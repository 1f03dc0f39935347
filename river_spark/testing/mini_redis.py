"""An in-process Redis-subset server speaking RESP2 over TCP.

No ``redis-server`` binary exists in this environment, so the Redis-wire
backend is exercised against this faithful subset implementation of the
PUBLIC Redis command semantics (streams + hashes + keyspace), written
from the published command documentation. The point is that
``RedisBackend`` speaks the real wire protocol: the same client bytes
work unmodified against a stock redis-server (the transport suite grows
a ``redis`` axis that runs here and, when ``RIVER_SPARK_REDIS_URL`` is
set, against a real server instead).

Implemented commands (the exact surface the reference transport uses,
``/root/reference/cpp/src/redis.cpp:63-389``): PING, AUTH, SELECT, TIME,
EXISTS, DEL, UNLINK, SCAN (MATCH/COUNT), GET, SET, HSET, HSETNX, HGET,
HGETALL,
XADD (auto ``*`` and explicit IDs with monotonicity enforcement), XLEN,
XRANGE / XREVRANGE (``-``/``+``, exclusive ``(`` bounds, COUNT), XREAD
(COUNT/BLOCK/``$``), XDEL, FLUSHALL — plus the reference server module's
three commands (``RIVER.batch_xadd`` / ``_variable`` / ``_compressed``,
``river_redismodule.c``), so module wire layouts are testable without a
compiled module.

Entry IDs follow the documented ``ms-seq`` ordering rules: ``*`` assigns
``max(now_ms, last_ms)`` with seq rollover, explicit IDs must be
strictly greater than the stream's top ID. Blocking XREAD waits on a
condition variable signalled by XADD.
"""

from __future__ import annotations

import fnmatch
import socket
import socketserver
import threading
import time


class _Stream:
    __slots__ = ("entries", "max_id")

    def __init__(self):
        # sorted list of ((ms, seq), [(field_bytes, value_bytes), ...])
        self.entries: list[tuple[tuple[int, int], list]] = []
        # last-GENERATED id: real Redis persists this high-water mark
        # across XDEL of the tail, so re-adding a deleted id must still be
        # rejected — deriving it from entries[-1] would let tests pass on
        # writes a stock server refuses
        self.max_id: tuple[int, int] = (0, 0)

    @property
    def last_id(self) -> tuple[int, int]:
        return self.max_id


def _parse_id(raw: bytes, default_seq: int) -> tuple[int, int]:
    s = raw.decode()
    if "-" in s:
        ms, seq = s.split("-", 1)
        return int(ms), int(seq)
    return int(s), default_seq


_MAX = (1 << 63, 1 << 63)


def _parse_range_bound(raw: bytes, is_start: bool) -> tuple[tuple[int, int], bool]:
    """Returns ((ms, seq), exclusive)."""
    exclusive = raw.startswith(b"(")
    if exclusive:
        raw = raw[1:]
    if raw == b"-":
        return (0, 0), exclusive
    if raw == b"+":
        return _MAX, exclusive
    return _parse_id(raw, 0 if is_start else (1 << 63)), exclusive


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.cond = threading.Condition(self.lock)
        self.streams: dict[bytes, _Stream] = {}
        self.hashes: dict[bytes, dict[bytes, bytes]] = {}
        self.strings: dict[bytes, bytes] = {}


class _Handler(socketserver.BaseRequestHandler):
    # ---- RESP parsing ------------------------------------------------------
    def _recv_line(self) -> bytes:
        while True:
            i = self._buf.find(b"\r\n")
            if i >= 0:
                line, self._buf = self._buf[:i], self._buf[i + 2:]
                return line
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError
            self._buf += chunk

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_command(self) -> list[bytes]:
        line = self._recv_line()
        if not line.startswith(b"*"):
            raise ConnectionError(f"inline commands unsupported: {line!r}")
        n = int(line[1:])
        args = []
        for _ in range(n):
            hdr = self._recv_line()
            if not hdr.startswith(b"$"):
                raise ConnectionError(f"expected bulk string, got {hdr!r}")
            size = int(hdr[1:])
            args.append(self._recv_exact(size))
            self._recv_exact(2)
        return args

    # ---- RESP encoding -----------------------------------------------------
    def _send(self, payload: bytes) -> None:
        self.request.sendall(payload)

    @classmethod
    def _enc(cls, obj) -> bytes:
        if obj is None:
            return b"$-1\r\n"
        if isinstance(obj, bool):  # before int: bool is int
            return b":%d\r\n" % int(obj)
        if isinstance(obj, int):
            return b":%d\r\n" % obj
        if isinstance(obj, bytes):
            return b"$%d\r\n%s\r\n" % (len(obj), obj)
        if isinstance(obj, str):
            b = obj.encode()
            return b"$%d\r\n%s\r\n" % (len(b), b)
        if isinstance(obj, SimpleString):
            return b"+%s\r\n" % obj.value
        if isinstance(obj, Error):
            return b"-%s\r\n" % obj.value
        if isinstance(obj, list):
            return b"*%d\r\n" % len(obj) + b"".join(cls._enc(x) for x in obj)
        raise TypeError(type(obj))

    # ---- dispatch ----------------------------------------------------------
    def handle(self):
        self._buf = b""
        self.request.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        state: _State = self.server.state
        while True:
            try:
                args = self._read_command()
            except ConnectionError:
                return
            if not args:
                continue
            cmd = args[0].upper().decode()
            # module commands carry a dot (RIVER.batch_xadd) — map to _
            method = getattr(self, "_cmd_" + cmd.lower().replace(".", "_"), None)
            try:
                if method is None:
                    reply = Error(f"ERR unknown command '{cmd}'")
                else:
                    reply = method(state, args[1:])
            except ValueError as e:
                reply = Error(f"ERR {e}")
            try:
                self._send(self._enc(reply))
            except OSError:
                return

    # ---- commands ----------------------------------------------------------
    def _cmd_ping(self, state, args):
        return SimpleString(b"PONG")

    def _cmd_auth(self, state, args):
        return SimpleString(b"OK")

    def _cmd_select(self, state, args):
        return SimpleString(b"OK")

    def _cmd_time(self, state, args):
        t = time.time()
        return [b"%d" % int(t), b"%06d" % int((t % 1) * 1e6)]

    def _cmd_flushall(self, state, args):
        with state.lock:
            state.streams.clear()
            state.hashes.clear()
            state.strings.clear()
        return SimpleString(b"OK")

    def _cmd_exists(self, state, args):
        with state.lock:
            return sum(
                1
                for k in args
                if k in state.streams or k in state.hashes or k in state.strings
            )

    def _cmd_del(self, state, args):
        with state.lock:
            n = 0
            for k in args:
                n += (
                    (state.streams.pop(k, None) is not None)
                    + (state.hashes.pop(k, None) is not None)
                    + (state.strings.pop(k, None) is not None)
                )
            return n

    _cmd_unlink = _cmd_del

    def _cmd_keys(self, state, args):
        pat = args[0].decode()
        with state.lock:
            names = list(state.streams) + list(state.hashes) + list(state.strings)
        return sorted(k for k in names if fnmatch.fnmatchcase(k.decode(), pat))

    # strings
    def _cmd_get(self, state, args):
        with state.lock:
            return state.strings.get(args[0])

    def _cmd_set(self, state, args):
        with state.lock:
            state.strings[args[0]] = args[1]
        return SimpleString(b"OK")

    def _cmd_scan(self, state, args):
        # single-page SCAN: cursor 0 -> (0, all matches); fine for a test box
        pat = "*"
        rest = list(args[1:])
        while rest:
            opt = rest.pop(0).upper()
            if opt == b"MATCH":
                pat = rest.pop(0).decode()
            elif opt == b"COUNT":
                rest.pop(0)
        with state.lock:
            names = list(state.streams) + list(state.hashes) + list(state.strings)
        matches = sorted(k for k in names if fnmatch.fnmatchcase(k.decode(), pat))
        return [b"0", matches]

    # hashes
    def _cmd_hset(self, state, args):
        key, fv = args[0], args[1:]
        if len(fv) % 2:
            raise ValueError("wrong number of arguments for 'hset' command")
        with state.lock:
            h = state.hashes.setdefault(key, {})
            added = sum(1 for f in fv[::2] if f not in h)
            for f, v in zip(fv[::2], fv[1::2]):
                h[f] = v
            return added

    def _cmd_hsetnx(self, state, args):
        key, field, value = args
        with state.lock:
            h = state.hashes.setdefault(key, {})
            if field in h:
                return 0
            h[field] = value
            return 1

    def _cmd_hget(self, state, args):
        with state.lock:
            return state.hashes.get(args[0], {}).get(args[1])

    def _cmd_hgetall(self, state, args):
        with state.lock:
            h = state.hashes.get(args[0], {})
            out = []
            for f, v in h.items():
                out += [f, v]
            return out

    # streams
    def _xadd_locked(self, state, key, raw_id, fields) -> bytes:
        """XADD core; caller must hold state.cond. Split out so the
        module commands can expand one client command into many entries
        ATOMICALLY (real Redis module commands are atomic — a reader must
        never observe a compressed blob without its reference chain)."""
        st = state.streams.setdefault(key, _Stream())
        last_ms, last_seq = st.last_id
        ever = st.max_id != (0, 0)
        if raw_id == b"*":
            ms = int(time.time() * 1000)
            if ms < last_ms:
                ms = last_ms
            seq = last_seq + 1 if ms == last_ms and ever else 0
        else:
            s = raw_id.decode()
            if s.endswith("-*"):
                ms = int(s[:-2])
                if ms < last_ms:
                    raise ValueError(
                        "The ID specified in XADD is equal or smaller than "
                        "the target stream top item"
                    )
                seq = last_seq + 1 if ms == last_ms and ever else 0
            else:
                ms, seq = _parse_id(raw_id, 0)
            # vs the persisted high-water mark, like real Redis; this
            # also rejects explicit 0-0 on an empty stream
            if (ms, seq) <= (last_ms, last_seq):
                raise ValueError(
                    "The ID specified in XADD is equal or smaller than "
                    "the target stream top item"
                )
        st.max_id = (ms, seq)
        st.entries.append(((ms, seq), fields))
        state.cond.notify_all()
        return b"%d-%d" % (ms, seq)

    def _cmd_xadd(self, state, args):
        key, raw_id, fv = args[0], args[1], args[2:]
        if len(fv) % 2:
            raise ValueError("wrong number of arguments for 'xadd' command")
        fields = list(zip(fv[::2], fv[1::2]))
        with state.cond:
            return self._xadd_locked(state, key, raw_id, fields)

    # ---- reference server-module commands (river_redismodule.c) -----------
    # The reference ships a Redis module whose three commands expand one
    # client round trip into many entries server-side; implementing them
    # here lets the transport suite exercise the module WIRE LAYOUTS —
    # including the compressed blob + `reference` entry chain — without a
    # real redis-server + compiled module.
    def _cmd_river_batch_xadd(self, state, args):
        """RIVER.batch_xadd <key> <index_start> <num_samples> <sample_size>
        <value>: one (i, val) entry per fixed-width sample, auto IDs,
        expanded atomically (river_redismodule.c:12-61)."""
        key, index_start, num_samples, sample_size, value = args
        start, n, ss = int(index_start), int(num_samples), int(sample_size)
        with state.cond:
            for i in range(n):
                self._xadd_locked(
                    state, key, b"*",
                    [(b"i", b"%d" % (start + i)), (b"val", value[i * ss:(i + 1) * ss])],
                )
        return SimpleString(b"OK")

    def _cmd_river_batch_xadd_compressed(self, state, args):
        """RIVER.batch_xadd_compressed <key> <index_start> <num_samples>
        <blob>: the first entry holds the whole batch's compressed blob
        under (i=index_start, val=blob); each remaining logical sample is
        an (i, reference=<blob entry id>) entry — all appended atomically,
        so no reader can see a blob without its reference chain
        (river_redismodule.c:63-131)."""
        key, index_start, num_samples, blob = args
        start, n = int(index_start), int(num_samples)
        with state.cond:
            blob_id = self._xadd_locked(
                state, key, b"*", [(b"i", b"%d" % start), (b"val", blob)]
            )
            for i in range(1, n):
                self._xadd_locked(
                    state, key, b"*",
                    [(b"i", b"%d" % (start + i)), (b"reference", blob_id)],
                )
        return SimpleString(b"OK")

    def _cmd_river_batch_xadd_variable(self, state, args):
        """RIVER.batch_xadd_variable <key> <index_start> <sizes> <value>:
        per-sample (i, val) entries, sample boundaries from the int32
        sizes array, expanded atomically (river_redismodule.c:134-184 —
        the C module casts client bytes to `const int *`, i.e. the
        server's native order; every supported platform here is
        little-endian, so decode explicitly as '<i4' rather than
        inheriting whatever this host's C int happens to be)."""
        import struct

        key, index_start, sizes_raw, value = args
        start = int(index_start)
        sizes = struct.unpack(f"<{len(sizes_raw) // 4}i", sizes_raw)
        off = 0
        with state.cond:
            for i, sz in enumerate(sizes):
                self._xadd_locked(
                    state, key, b"*",
                    [(b"i", b"%d" % (start + i)), (b"val", value[off:off + sz])],
                )
                off += sz
        return SimpleString(b"OK")

    def _cmd_xlen(self, state, args):
        with state.lock:
            st = state.streams.get(args[0])
            return len(st.entries) if st else 0

    @staticmethod
    def _entry_reply(entry):
        (ms, seq), fields = entry
        flat = []
        for f, v in fields:
            flat += [f, v]
        return [b"%d-%d" % (ms, seq), flat]

    def _range(self, state, key, lo, lo_ex, hi, hi_ex, count, reverse):
        with state.lock:
            st = state.streams.get(key)
            if st is None:
                return []
            sel = [
                e
                for e in st.entries
                if (e[0] > lo if lo_ex else e[0] >= lo)
                and (e[0] < hi if hi_ex else e[0] <= hi)
            ]
        if reverse:
            sel.reverse()
        if count is not None:
            sel = sel[:count]
        return [self._entry_reply(e) for e in sel]

    @staticmethod
    def _parse_count(rest: list[bytes]) -> int | None:
        if rest and rest[0].upper() == b"COUNT":
            return int(rest[1])
        return None

    def _cmd_xrange(self, state, args):
        key, lo_raw, hi_raw, *rest = args
        lo, lo_ex = _parse_range_bound(lo_raw, True)
        hi, hi_ex = _parse_range_bound(hi_raw, False)
        return self._range(state, key, lo, lo_ex, hi, hi_ex, self._parse_count(rest), False)

    def _cmd_xrevrange(self, state, args):
        key, hi_raw, lo_raw, *rest = args
        hi, hi_ex = _parse_range_bound(hi_raw, False)
        lo, lo_ex = _parse_range_bound(lo_raw, True)
        return self._range(state, key, lo, lo_ex, hi, hi_ex, self._parse_count(rest), True)

    def _cmd_xdel(self, state, args):
        key, ids = args[0], [_parse_id(a, 0) for a in args[1:]]
        with state.lock:
            st = state.streams.get(key)
            if st is None:
                return 0
            before = len(st.entries)
            drop = set(ids)
            st.entries = [e for e in st.entries if e[0] not in drop]
            return before - len(st.entries)

    def _cmd_xread(self, state, args):
        count, block_ms = None, None
        i = 0
        while i < len(args):
            opt = args[i].upper()
            if opt == b"COUNT":
                count = int(args[i + 1]); i += 2
            elif opt == b"BLOCK":
                block_ms = int(args[i + 1]); i += 2
            elif opt == b"STREAMS":
                i += 1
                break
            else:
                raise ValueError(f"syntax error near {opt!r}")
        rest = args[i:]
        nkeys = len(rest) // 2
        keys, raw_ids = rest[:nkeys], rest[nkeys:]
        deadline = None if block_ms is None else time.monotonic() + block_ms / 1000.0

        def _collect():
            out = []
            for key, raw in zip(keys, raw_ids):
                st = state.streams.get(key)
                if raw == b"$":
                    after = st.last_id if st else (0, 0)
                else:
                    after = _parse_id(raw, 0)
                if st is None:
                    continue
                sel = [e for e in st.entries if e[0] > after]
                if count is not None:
                    sel = sel[:count]
                if sel:
                    out.append([key, [self._entry_reply(e) for e in sel]])
            return out

        with state.cond:
            # `$` must resolve once, against the state at call time
            resolved = []
            for key, raw in zip(keys, raw_ids):
                if raw == b"$":
                    st = state.streams.get(key)
                    resolved.append(
                        (b"%d-%d" % st.last_id) if st else b"0-0"
                    )
                else:
                    resolved.append(raw)
            raw_ids = resolved
            while True:
                out = _collect()
                if out:
                    return out
                if deadline is None:
                    return None  # non-blocking, nothing new
                remaining = deadline - time.monotonic()
                if block_ms == 0:
                    state.cond.wait()
                elif remaining <= 0:
                    return None
                else:
                    state.cond.wait(remaining)


class SimpleString:
    def __init__(self, value: bytes):
        self.value = value


class Error:
    def __init__(self, value: str):
        self.value = value.encode()


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class MiniRedisServer:
    """Context manager: starts the server on an ephemeral port.

    >>> with MiniRedisServer() as (host, port): ...
    """

    def __init__(self, host: str = "127.0.0.1"):
        self._server = _Server((host, 0), _Handler)
        self._server.state = _State()
        self._thread = threading.Thread(
            target=self._server.serve_forever, kwargs={"poll_interval": 0.05}, daemon=True
        )

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    def start(self) -> "MiniRedisServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        self.start()
        return self.address

    def __exit__(self, *exc):
        self.stop()
