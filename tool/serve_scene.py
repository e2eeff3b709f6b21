"""Serve a reconstruction output directory over HTTP.

The reference ships a gradio server (`dust3r/demo.py:283 demo.launch`)
whose product is an interactive 3D view of the reconstructed scene. Our
viewer is a self-contained static page (`eval/html_viewer.py` scene.html,
WebGL, no runtime deps) plus a `scene.glb`; this wrapper closes the
"served UI" gap with the standard-library HTTP server — point it at a
`tool/demo.py` output directory and open the printed URL.

Usage:
  python tool/serve_scene.py OUT_DIR [--port 7860] [--host 127.0.0.1]

No third-party dependencies (gradio is not installed in this image, and a
static page + glb needs none).
"""
from __future__ import annotations

import argparse
import functools
import http.server
import os
import sys


def make_server(out_dir: str, host: str = "127.0.0.1", port: int = 7860):
    """Configured ThreadingHTTPServer rooted at out_dir ('/' redirects to
    scene.html, .glb served as model/gltf-binary). port=0 = ephemeral."""
    root = os.path.abspath(out_dir)
    if not os.path.isdir(root):
        raise SystemExit(f"not a directory: {root}")
    index = next((f for f in ("scene.html", "index.html")
                  if os.path.exists(os.path.join(root, f))), None)

    class Handler(http.server.SimpleHTTPRequestHandler):
        extensions_map = dict(
            http.server.SimpleHTTPRequestHandler.extensions_map,
            **{".glb": "model/gltf-binary"})

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path in ("", "/") and index:
                self.path = "/" + index
            return super().do_GET()

        def log_message(self, fmt, *a):
            sys.stderr.write("[serve] " + fmt % a + "\n")

    handler = functools.partial(Handler, directory=root)
    return http.server.ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", help="demo output directory (contains "
                                    "scene.html / scene.glb)")
    ap.add_argument("--port", type=int, default=7860)  # gradio's default
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--once", action="store_true",
                    help="handle a single request and exit (for tests)")
    args = ap.parse_args(argv)

    with make_server(args.out_dir, args.host, args.port) as srv:
        host, port = srv.server_address[:2]
        print(f"serving {os.path.abspath(args.out_dir)} at "
              f"http://{host}:{port}/", flush=True)
        if args.once:
            srv.handle_request()
        else:
            srv.serve_forever()


if __name__ == "__main__":
    main()
