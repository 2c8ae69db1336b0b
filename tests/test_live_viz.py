"""Live during-solve viz: snapshot writer, pause protocol, serve handler."""

import json
import os
import threading
import time
import urllib.request

import numpy as np

from super_primitive_tpu.viz.live import LIVE_HTML, LIVE_JSON, PAUSE_MARKER, LiveViz
from super_primitive_tpu.viz.serve import serve


def test_liveviz_snapshots(tmp_path):
    lv = LiveViz(str(tmp_path), title="t")
    assert os.path.exists(tmp_path / LIVE_HTML)
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    lv.update({"kf0": (pts, None)}, label="frame 1", loss=0.5)
    lv.update({"kf0": (pts, None)}, trajectories={"track": pts[:5]},
              label="frame 2")
    d = json.loads((tmp_path / LIVE_JSON).read_text())
    assert d["seq"] == 2 and d["label"] == "frame 2"
    assert d["clouds"]["kf0"]["n"] == 50
    assert d["trajs"]["track"]["n"] == 5
    assert d["loss"] is None  # nan default serializes as null


def test_pause_checkpoint_blocks(tmp_path):
    lv = LiveViz(str(tmp_path), poll_s=0.05)
    marker = tmp_path / PAUSE_MARKER
    marker.touch()
    t = threading.Timer(0.3, marker.unlink)
    t.start()
    paused = lv.checkpoint()
    assert paused >= 0.25
    assert lv.checkpoint() < 0.05  # no marker: immediate


def test_stale_marker_cleared_on_init(tmp_path):
    (tmp_path / PAUSE_MARKER).touch()
    LiveViz(str(tmp_path))
    assert not (tmp_path / PAUSE_MARKER).exists()


def test_serve_get_and_pause_toggle(tmp_path):
    lv = LiveViz(str(tmp_path))
    lv.update({"c": (np.zeros((3, 3), np.float32), None)})
    httpd = serve(str(tmp_path), port=0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/{LIVE_JSON}") as r:
            assert r.headers["Cache-Control"] == "no-store"
            d = json.loads(r.read())
            assert d["clouds"]["c"]["n"] == 3
        with urllib.request.urlopen(f"{base}/{LIVE_HTML}") as r:
            assert b"webgl" in r.read()
        req = urllib.request.Request(f"{base}/pause", method="POST")
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["paused"] is True
        assert (tmp_path / PAUSE_MARKER).exists()
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["paused"] is False
        assert not (tmp_path / PAUSE_MARKER).exists()
    finally:
        httpd.shutdown()
