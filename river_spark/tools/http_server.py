"""HTTP read API over ingested data (A23 parity).

Reference: ``cpp/ingester/src/ingester_http_server.cpp:19-147`` — three
endpoints over the ingester's output directory, default port 7487
(``ingester_main.cpp:41-42``):

- ``GET /api/streams``                      → list + each metadata.json
- ``GET /api/streams/{name}``               → one stream's metadata
- ``GET /api/streams/{name}/data.parquet``  → the compacted file, chunked
  (16 MiB chunks in the reference)

Stdlib-only implementation: at scale this role belongs to Spark
Connect / Thrift or plain object-store access, but the API surface is
preserved for drop-in parity.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

DEFAULT_PORT = 7487  # cpp/ingester/src/ingester_main.cpp:41-42
CHUNK = 16 * 1024 * 1024  # ingester_http_server.cpp chunked transfer


def _make_handler(out_root: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _stream_meta(self, name: str):
            p = os.path.join(out_root, name, "metadata.json")
            if not os.path.exists(p):
                return None
            with open(p) as f:
                return json.load(f)

        def do_GET(self):
            parts = [p for p in self.path.split("/") if p]
            if parts[:2] != ["api", "streams"]:
                return self._json(404, {"error": "not found"})
            if len(parts) == 2:
                streams = {}
                if os.path.isdir(out_root):
                    for name in sorted(os.listdir(out_root)):
                        meta = self._stream_meta(name)
                        if meta is not None:
                            streams[name] = meta
                return self._json(200, {"streams": streams})
            name = parts[2]
            # the URL segment becomes a filesystem path component: reject
            # traversal ('..', separators) so /api/streams/.. can't serve
            # files above the output root
            if name in ("", ".", "..") or "/" in name or "\\" in name or os.sep in name:
                return self._json(404, {"error": "not found"})
            meta = self._stream_meta(name)
            if meta is None:
                return self._json(404, {"error": f"stream {name!r} not found"})
            if len(parts) == 3:
                return self._json(200, meta)
            if len(parts) == 4 and parts[3] == "data.parquet":
                # monolithic layout serves the file itself; size-tiered
                # layouts (data_*.parquet parts) serve a lazily merged
                # single-file cache so the reference's one-file endpoint
                # contract still holds for large finalized streams
                from river_spark.ingest.layout import servable_file

                path = servable_file(os.path.join(out_root, name))
                if path is None:
                    return self._json(404, {"error": "no data files (not compacted?)"})
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(os.path.getsize(path)))
                self.end_headers()
                with open(path, "rb") as f:
                    while True:
                        chunk = f.read(CHUNK)
                        if not chunk:
                            break
                        self.wfile.write(chunk)
                return
            return self._json(404, {"error": "not found"})

    return Handler


class IngesterHttpServer:
    """Serve an ingester output root; ``with IngesterHttpServer(root) as url:``."""

    def __init__(self, out_root: str, port: int = 0):
        self._server = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(out_root))
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> str:
        self._thread.start()
        return f"http://127.0.0.1:{self.port}"

    def __exit__(self, *exc):
        self._server.shutdown()
        self._server.server_close()


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="ingester output root")
    ap.add_argument("--port", type=int, default=DEFAULT_PORT)
    args = ap.parse_args(argv)
    srv = IngesterHttpServer(args.out, args.port)
    with srv as url:
        print(f"serving {args.out} at {url}/api/streams")
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
