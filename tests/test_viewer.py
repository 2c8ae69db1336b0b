"""HTML point-cloud viewer: data round-trip + template integrity."""

import base64
import json
import re

import numpy as np

from super_primitive_tpu.viz.viewer import save_html_viewer


def _extract_data(html: str) -> dict:
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA json not found"
    return json.loads(m.group(1))


def _unpack(cloud):
    xyz = np.frombuffer(base64.b64decode(cloud["xyz"]), np.float32).reshape(-1, 3)
    rgb = np.frombuffer(base64.b64decode(cloud["rgb"]), np.uint8).reshape(-1, 3)
    assert len(xyz) == cloud["n"] and len(rgb) == cloud["n"]
    return xyz, rgb


class TestViewer:
    def test_roundtrip(self, tmp_path):
        r = np.random.default_rng(0)
        pts = r.normal(size=(100, 3)).astype(np.float32)
        cols = r.uniform(0, 1, size=(100, 3)).astype(np.float32)
        traj = r.normal(size=(7, 3)).astype(np.float32)
        frames = [
            {"label": "it 10", "loss": 0.5,
             "clouds": {"est": (pts * 2, None)}},
            {"label": "it 20", "loss": 0.25,
             "clouds": {"est": (pts * 3, cols)}},
        ]
        path = save_html_viewer(
            str(tmp_path / "v.html"), {"kf0": (pts, cols)},
            trajectories={"cam": traj}, frames=frames,
        )
        html = open(path).read()
        data = _extract_data(html)

        xyz, rgb = _unpack(data["clouds"]["kf0"])
        np.testing.assert_allclose(xyz, pts)
        np.testing.assert_array_equal(
            rgb, (np.clip(cols, 0, 1) * 255).astype(np.uint8)
        )
        txyz, _ = _unpack(data["trajs"]["cam"])
        np.testing.assert_allclose(txyz, traj)
        assert [f["label"] for f in data["frames"]] == ["it 10", "it 20"]
        assert data["frames"][1]["loss"] == 0.25
        fxyz, frgb = _unpack(data["frames"][0]["clouds"]["est"])
        np.testing.assert_allclose(fxyz, pts * 2)
        np.testing.assert_array_equal(frgb, 180)  # default grey

    def test_segment_ids_roundtrip(self, tmp_path):
        r = np.random.default_rng(1)
        pts = r.normal(size=(50, 3)).astype(np.float32)
        seg = r.integers(0, 7, size=(50,)).astype(np.int32)
        frames = [{"label": "it", "loss": 1.0,
                   "clouds": {"est": (pts, None, seg)}}]
        path = save_html_viewer(
            str(tmp_path / "v.html"),
            {"kf0": (pts, None, seg), "plain": (pts, None)},
            frames=frames,
        )
        data = _extract_data(open(path).read())
        got = np.frombuffer(
            base64.b64decode(data["clouds"]["kf0"]["seg"]), np.uint16
        )
        np.testing.assert_array_equal(got, seg.astype(np.uint16))
        assert "seg" not in data["clouds"]["plain"]
        fgot = np.frombuffer(
            base64.b64decode(data["frames"][0]["clouds"]["est"]["seg"]), np.uint16
        )
        np.testing.assert_array_equal(fgot, seg.astype(np.uint16))

    def test_picker_template_markers(self, tmp_path):
        # the segment-picker machinery must survive template edits: a pick
        # framebuffer pass, id-color decode, and the selection UI element
        path = save_html_viewer(
            str(tmp_path / "v.html"), {"c": (np.zeros((1, 3)), None)}
        )
        html = open(path).read()
        for marker in ("readPixels", "createFramebuffer", "pickables",
                       "selActive", "new Map()"):
            assert marker in html, marker

    def test_template_self_contained(self, tmp_path):
        path = save_html_viewer(
            str(tmp_path / "v.html"), {"c": (np.zeros((1, 3)), None)}
        )
        html = open(path).read()
        # self-contained: WebGL entry points present, no external fetches
        for marker in ("getContext('webgl')", "requestAnimationFrame",
                       "gl.POINTS", "gl.LINE_STRIP"):
            assert marker in html, marker
        assert "http://" not in html and "https://" not in html
        # balanced script tags, single document
        assert html.count("<script>") == 1 and html.count("</script>") == 1
