"""Structured fake SAM / NNET models (VERDICT r1 #6a).

Real checkpoints are unavailable in this container; random-weight nets
produce degenerate masks, so the perception->estimation chain could never be
exercised coherently.  These fakes are *structured*: FakeSAM emits coherent
blob masks (a seeded anisotropic-Voronoi over-segmentation, three nested
candidates per query point, mimicking SAM's part/object/scene multimask);
FakeNNET emits the analytic camera-frame normals of a
data/synthetic.PlanesScene (what a perfect normal net would predict).

Both plug into the REAL FrontProcessor via its injected-model seams
(process_frame.py), so every production code path runs: two-round mask
generation with stability filtering + NMS + active resampling
(mask_generation.infer_masks), coarse-edge maps, BiNI crop/full-routed
integration, keypoint snapping, and the depth-discontinuity CC split.
Reference behavior being proxied: frontend/process_frame.py:207-255.
"""

from __future__ import annotations

import numpy as np

from ..config.schema import Config
from .process_frame import FrontProcessor


class FakeSAM:
    """Seeded Voronoi blob masks with SAM's (B, 3, H, W) multimask contract.

    Candidate 0 is the query's cell (part-like), candidates 1 and 2 its
    dilations (object/scene-like).  Smallest-good selection therefore picks
    the exact Voronoi cell, so chosen masks tile the image with near-complete
    coverage — like real SAM output on textured scenes.
    """

    def __init__(self, n_cells: int = 48, seed: int = 0, morph_iters: int = 2):
        self.n_cells = n_cells
        self.seed = seed
        self.morph_iters = morph_iters
        self._cache: dict[tuple[int, int], tuple] = {}

    def _cells(self, H: int, W: int):
        key = (H, W)
        if key not in self._cache:
            from scipy.ndimage import binary_dilation

            r = np.random.default_rng(self.seed)
            seeds = np.stack(
                [r.uniform(0, H, self.n_cells), r.uniform(0, W, self.n_cells)],
                axis=1,
            )
            aniso = r.uniform(0.6, 1.6, (self.n_cells, 2))
            u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                               np.arange(H, dtype=np.float32))
            d2 = (
                ((v[None] - seeds[:, 0, None, None]) * aniso[:, 0, None, None]) ** 2
                + ((u[None] - seeds[:, 1, None, None]) * aniso[:, 1, None, None]) ** 2
            )
            labels = np.argmin(d2, axis=0)
            small = np.zeros((self.n_cells, H, W), bool)
            mid = np.zeros((self.n_cells, H, W), bool)
            big = np.zeros((self.n_cells, H, W), bool)
            for i in range(self.n_cells):
                m = labels == i
                small[i] = m
                mid[i] = binary_dilation(m, iterations=self.morph_iters)
                big[i] = binary_dilation(m, iterations=3 * self.morph_iters)
            self._cache[key] = (labels, small, mid, big)
        return self._cache[key]

    def __call__(self, image: np.ndarray, kps_norm: np.ndarray):
        H, W = image.shape[:2]
        labels, small, mid, big = self._cells(H, W)
        dims = np.asarray([H, W], np.float32)
        rc = np.round(0.5 * (dims - 1) * (np.asarray(kps_norm) + 1)).astype(np.int64)
        rc[:, 0] = np.clip(rc[:, 0], 0, H - 1)
        rc[:, 1] = np.clip(rc[:, 1], 0, W - 1)
        cell = labels[rc[:, 0], rc[:, 1]]
        logits = np.stack(
            [small[cell], mid[cell], big[cell]], axis=1
        ).astype(np.float32) * 20.0 - 10.0                      # (B, 3, H, W)
        iou = np.tile(
            np.asarray([0.88, 0.97, 0.92], np.float32), (len(cell), 1)
        )
        return logits, iou


class FakeNNET:
    """Analytic scene normals in place of the normal net.

    The driver's ``observe(frame)`` hook supplies the frame's pose; the
    callable then renders the PlanesScene's camera-frame normals at the
    requested image resolution (kappa is a constant high-confidence field —
    the reference computes but never consumes it, SURVEY §2.4).
    """

    def __init__(self, scene, noise: float = 0.0, seed: int = 3):
        self.scene = scene
        self.noise = noise
        self._rng = np.random.default_rng(seed)
        self._T = np.eye(4)
        self._K = None
        self._native_hw = None

    def observe(self, T_wc: np.ndarray, K: np.ndarray, hw: tuple[int, int]):
        self._T = np.asarray(T_wc, np.float64)
        self._K = np.asarray(K, np.float64)
        self._native_hw = hw

    def __call__(self, img01: np.ndarray):
        H, W = img01.shape[:2]
        if self._K is None:
            raise RuntimeError("FakeNNET.observe(frame) must run before inference")
        Hn, Wn = self._native_hw
        K = self._K.copy()
        K[0] *= W / Wn
        K[1] *= H / Hn
        r = self.scene.render(self._T, K, H, W)
        normals = r["normals"]
        if self.noise > 0:
            normals = normals + self.noise * self._rng.normal(
                size=normals.shape
            ).astype(np.float32)
            normals /= np.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12
        kappa = np.full((H, W, 1), 10.0, np.float32)
        return normals, kappa


class StructuredFakeFrontend(FrontProcessor):
    """The REAL FrontProcessor running on structured fakes.

    Drop-in for build_frontend's output; additionally implements the
    odometry driver's ``observe(frame)`` hook to feed the frame pose to
    FakeNNET.
    """

    def __init__(self, config: Config, scene=None, seed: int = 0,
                 n_cells: int = 48, normal_noise: float = 0.0):
        if scene is None:
            from ..data.synthetic import PlanesScene

            scene = PlanesScene()
        self.scene = scene
        self._fake_nnet = FakeNNET(scene, noise=normal_noise)
        super().__init__(
            config,
            normals_fn=self._fake_nnet,
            mask_predict_fn=FakeSAM(n_cells=n_cells, seed=seed),
            rng=np.random.default_rng(42 + seed),
        )

    def observe(self, frame: dict):
        img = np.asarray(frame["image"])
        self._fake_nnet.observe(
            np.asarray(frame["T"]), np.asarray(frame["intrinsics"]),
            img.shape[:2],
        )
