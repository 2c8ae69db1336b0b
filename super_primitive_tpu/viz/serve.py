"""Tiny stdlib server for the live viewer.

    python -m super_primitive_tpu.viz.serve RUN_DIR [--port 8765]

Serves the run directory (``live.html`` + ``live.json`` written by
viz.live.LiveViz) and maps the page's ``POST /pause`` onto the ``pause``
marker file the solver's :meth:`LiveViz.checkpoint` polls — the headless
equivalent of the reference GUI's pause toggle queue
(gui/odometery_gui.py:393-395).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

from .live import PAUSE_MARKER


class LiveHandler(SimpleHTTPRequestHandler):
    def do_POST(self):
        if self.path.lstrip("/").split("?")[0] != "pause":
            self.send_error(404)
            return
        marker = os.path.join(self.directory, PAUSE_MARKER)
        if os.path.exists(marker):
            os.remove(marker)
            paused = False
        else:
            open(marker, "w").close()
            paused = True
        body = json.dumps({"paused": paused}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def end_headers(self):
        # live.json must never be cached by the polling page
        self.send_header("Cache-Control", "no-store")
        super().end_headers()

    def log_message(self, fmt, *args):  # quiet
        pass


def serve(directory: str, port: int = 8765) -> ThreadingHTTPServer:
    handler = functools.partial(LiveHandler, directory=directory)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), handler)
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--port", type=int, default=8765)
    args = ap.parse_args()
    httpd = serve(args.dir, args.port)
    print(f"live viewer: http://localhost:{args.port}/live.html "
          f"(serving {args.dir})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
