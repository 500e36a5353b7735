"""Viewer service: ply/zip loading, animation frames, HTTP render endpoint."""

import io
import json
import urllib.request
import zipfile

import numpy as np
import pytest

from brush_tpu.io.ply import save_splat_ply
from brush_tpu.viewer.service import Slot, load_source_into_slot, serve


def write_ply(path, n=32, seed=0, shift=0.0):
    rng = np.random.default_rng(seed)
    save_splat_ply(
        str(path),
        means=rng.normal(shift, 0.5, (n, 3)),
        log_scales=np.full((n, 3), np.log(0.1)),
        quats=np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32),
        sh_coeffs=rng.normal(0, 0.3, (n, 1, 3)),
        raw_opacities=np.full(n, 1.0),
    )


def test_animation_zip_frames(tmp_path):
    for i in range(3):
        write_ply(tmp_path / f"frame_{i}.ply", seed=i, shift=0.2 * i)
    zp = tmp_path / "anim.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for i in range(3):
            z.write(tmp_path / f"frame_{i}.ply", f"frame_{i}.ply")
    slot = Slot()
    load_source_into_slot(str(zp), slot, sh_degree=0)
    assert slot.n_frames == 3
    s0, s2 = slot.get(0), slot.get(2)
    assert int(s0.n_alive) == 32
    assert not np.allclose(np.asarray(s0.means)[:32], np.asarray(s2.means)[:32])


def test_http_render_endpoint(tmp_path):
    write_ply(tmp_path / "scene.ply")
    server = serve(str(tmp_path / "scene.ply"), port=0, sh_degree=0,
                   use_pallas=False, blocking=False)
    try:
        port = server.server_address[1]
        info = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/info", timeout=60).read())
        assert info["n_splats"] == 32
        assert info["n_frames"] == 1

        img_bytes = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?px=0&py=0&pz=-4&w=64&h=48",
            timeout=300).read()
        from PIL import Image
        img = Image.open(io.BytesIO(img_bytes))
        assert img.size == (64, 48)

        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=60).read()
        assert b"brush_tpu" in html

        # Unknown path -> 404.
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=60)
    finally:
        server.shutdown()


def test_js_api_endpoints(tmp_path):
    """brush.js client library + binary splat buffer + SSE message stream
    (counterpart of the reference's JS API, apps/brush-js/src/lib.rs)."""
    import struct

    from brush_tpu.viewer.slot import MessageBus

    write_ply(tmp_path / "scene.ply", n=16)
    bus = MessageBus()
    server = serve(str(tmp_path / "scene.ply"), port=0, sh_degree=0,
                   use_pallas=False, blocking=False, bus=bus)
    try:
        port = server.server_address[1]
        js = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/brush.js", timeout=60).read()
        assert b"class BrushClient" in js

        raw = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/splats?frame=0", timeout=60).read()
        magic, version, count, sh_coeffs = struct.unpack_from("<4sIII", raw)
        assert magic == b"BSPL" and version == 1
        assert count == 16 and sh_coeffs == 1
        body = np.frombuffer(raw, np.float32, offset=16)
        # means(3) + log_scales(3) + quats(4) + sh(C*3) + opacity(1)
        assert body.size == count * (3 + 3 + 4 + sh_coeffs * 3 + 1)
        means = body[:count * 3].reshape(count, 3)
        assert np.isfinite(means).all()

        # SSE stream delivers published training messages. Publish from a
        # background thread until received — the subscription only exists
        # once the /events handler runs, so a single publish could race it.
        import threading
        import time

        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/events", timeout=60)
        got = threading.Event()

        def pump():
            while not got.is_set():
                bus.publish({"kind": "step", "iter": 7, "loss": 0.5})
                time.sleep(0.1)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        try:
            line = resp.readline()
            while not line.startswith(b"data:"):
                line = resp.readline()
        finally:
            got.set()
        msg = json.loads(line[5:].strip())
        assert msg["iter"] == 7 and msg["kind"] == "step"
        resp.close()
    finally:
        server.shutdown()


def test_render_params_scale_fov_bg(tmp_path):
    """Viewer render knobs: splat-scale slider, fov, background color
    (reference viewer Appendix F capabilities)."""
    write_ply(tmp_path / "scene.ply", n=8)
    server = serve(str(tmp_path / "scene.ply"), port=0, sh_degree=0,
                   use_pallas=False, blocking=False)
    try:
        port = server.server_address[1]

        def grab(qs):
            from PIL import Image
            data = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/render?px=0&py=0&pz=-30"
                f"&w=32&h=32&{qs}", timeout=300).read()
            return np.asarray(Image.open(io.BytesIO(data)), np.float32)

        base = grab("")
        big = grab("scale=3.0")
        red_bg = grab("bg=1,0,0")
        wide = grab("fov=2.2")
        assert np.abs(big - base).max() > 3      # bigger splats
        assert red_bg[..., 0].mean() > base[..., 0].mean() + 10
        assert np.abs(wide - base).max() > 3     # zoomed out
    finally:
        server.shutdown()


def test_url_source_zip(tmp_path):
    """URL data sources: a zip served over HTTP loads like a local zip
    (brush-vfs data_source.rs Url arm)."""
    import functools
    import http.server
    import threading

    for i in range(2):
        write_ply(tmp_path / f"f_{i}.ply", seed=i)
    zp = tmp_path / "anim.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for i in range(2):
            z.write(tmp_path / f"f_{i}.ply", f"f_{i}.ply")

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path))
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/anim.zip"
        slot = Slot()
        load_source_into_slot(url, slot, sh_degree=0)
        assert slot.n_frames == 2

        # Single-file URL too.
        from brush_tpu.data.vfs import Vfs
        v = Vfs(f"http://127.0.0.1:{httpd.server_address[1]}/f_0.ply")
        assert v.names() == ["f_0.ply"]
        assert v.read_bytes("f_0.ply")[:3] == b"ply"
    finally:
        httpd.shutdown()
