"""HTTP live viewer (interactive presentation path)."""

import io
import json
import urllib.request

import numpy as np
from PIL import Image

from nrc_tpu.app.viewer import Viewer
from nrc_tpu.scene.camera import Camera


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


def test_viewer_serves_frames_and_controls():
    v = Viewer(port=0)
    try:
        # page
        page = _get(v.url).decode()
        assert "frame.png" in page and "orbit" in page
        assert "lossplot" in page  # loss sparkline (Stats-window plot)

        # publish a frame, read it back
        img = np.zeros((8, 8, 3), np.uint8)
        img[:, :, 0] = 255
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        v.publish(buf.getvalue(), iteration=3, fps=1.5, loss=0.25,
                  loss_history=[1.0, 0.5, 0.25])

        back = np.asarray(Image.open(io.BytesIO(_get(v.url + "frame.png"))))
        assert back.shape[:2] == (8, 8) and back[0, 0, 0] == 255

        stats = json.loads(_get(v.url + "stats"))
        assert stats == {"iteration": 3, "fps": 1.5, "loss": 0.25,
                         "loss_history": [1.0, 0.5, 0.25]}

        # camera verbs round-trip through the event queue
        _get(v.url + "control?op=orbit&dx=0.25&dy=0.1")
        _get(v.url + "control?op=dolly&d=1")
        _get(v.url + "control?op=pan&dx=0.1&dy=0.0")
        _get(v.url + "control?op=zoom&d=-1")
        cam = Camera(distance=10.0, fov=60.0)
        phi0, d0, c0, fov0 = cam.phi, cam.distance, cam.center, cam.fov
        assert v.apply_events(cam) is True
        assert cam.phi != phi0 and cam.distance != d0
        assert cam.center != c0 and cam.fov != fov0
        assert v.apply_events(cam) is False  # queue drained
    finally:
        v.close()


def test_camera_verbs():
    cam = Camera(center=(0.0, 1.0, 0.0), distance=5.0)
    p0, _, _, w0 = cam.frustum()
    cam.pan(0.5, 0.0)
    assert not np.allclose(cam.center, (0.0, 1.0, 0.0))
    cam.zoom(200.0)
    assert cam.fov == 179.0
    cam.focus((2.0, 0.0, 1.0))
    assert np.allclose(cam.center, (2.0, 0.0, 1.0))
    assert cam.distance > 0.0


def test_action_endpoint():
    """P/H/S key-handler parity + cache reset route through /action."""
    from nrc_tpu.app.viewer import Viewer

    v = Viewer(port=0)
    try:
        for op in ("screenshot_png", "screenshot_hdr", "save_system",
                   "reset_cache", "bogus_op"):
            _get(v.url + f"action?op={op}")
        acts = v.drain_actions()
        assert acts == ["screenshot_png", "screenshot_hdr", "save_system",
                        "reset_cache"]  # bogus filtered
        assert v.drain_actions() == []
        # page advertises the buttons/keys
        page = _get(v.url)
        assert b"screenshot_png" in page and b"keydown" in page
    finally:
        v.close()
