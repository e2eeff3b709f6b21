"""tool/serve_scene.py: the served-UI wrapper actually serves the scene
artifacts (index redirect to scene.html, correct glb MIME)."""
import os
import sys
import threading
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tool"))


def test_serve_scene_serves_html_and_glb(tmp_path):
    (tmp_path / "scene.html").write_text("<html>ALIGN3R VIEWER</html>")
    (tmp_path / "scene.glb").write_bytes(b"glTF\x02\x00\x00\x00")
    import serve_scene

    with serve_scene.make_server(str(tmp_path), port=0) as srv:
        port = srv.server_address[1]
        t = threading.Thread(
            target=lambda: [srv.handle_request() for _ in range(2)],
            daemon=True)
        t.start()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                    timeout=10) as r:
            assert b"ALIGN3R VIEWER" in r.read()   # '/' -> scene.html
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/scene.glb",
                                    timeout=10) as r:
            assert r.headers["Content-Type"] == "model/gltf-binary"
            assert r.read().startswith(b"glTF")
        t.join(10)
