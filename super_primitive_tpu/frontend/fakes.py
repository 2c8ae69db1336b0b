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

    def __init__(self, scene, noise: float = 0.0, seed: int = 3,
                 coarse_hw: tuple[int, int] | None = None):
        self.scene = scene
        self.noise = noise
        self.coarse_hw = coarse_hw
        self._rng = np.random.default_rng(seed)
        self._T = np.eye(4)
        self._K = None
        self._native_hw = None

    def observe(self, T_wc: np.ndarray, K: np.ndarray, hw: tuple[int, int]):
        self._T = np.asarray(T_wc, np.float64)
        self._K = np.asarray(K, np.float64)
        self._native_hw = hw

    def __call__(self, img01: np.ndarray):
        # like the real predict_normals with coarse_hw (include_normals off):
        # emit DEVICE normals at the integration shape, so the frontend's
        # BiNI-overlap path engages and no host resize runs.  The analytic
        # render happens directly at the coarse shape (4x less host work
        # than rendering at network_dim and downsampling).
        H, W = self.coarse_hw or img01.shape[:2]
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
        if self.coarse_hw is not None:
            import jax.numpy as jnp

            return jnp.asarray(normals), kappa
        return normals, kappa


def _fake_lowres_logits(seeds, aniso, pts, t_vec, alpha, S: int, s: float):
    """(B, 3, S, S) Voronoi-margin logits + (B, 3) iou predictions ON DEVICE.

    For prompt b with Voronoi cell c = argmin_k d_k(p_b), the logit field is
    the signed margin f(x) = min_{j != c} d_j(x) - d_c(x) (anisotropic
    distances, input-frame pixels): positive inside the cell, ~linear across
    the boundary — so thresholding at 0 yields the exact cell while the +-1
    stability band does real filtering work.  Candidates 1/2 shift the margin
    by t_vec (nested dilations, SAM's part/object/scene nesting), mirroring
    the host FakeSAM's morphological dilations.
    """
    import jax
    import jax.numpy as jnp

    p = pts[:, 0]  # (B, 2) xy — positive point (row 1 is the SAM pad point)
    qy = (p[:, 1][:, None] - seeds[None, :, 0]) * aniso[None, :, 0]
    qx = (p[:, 0][:, None] - seeds[None, :, 1]) * aniso[None, :, 1]
    cell = jnp.argmin(qy * qy + qx * qx, axis=1)  # (B,)

    # low-res grid pixel centers in input-frame coords (half-pixel conv.)
    cc = (jnp.arange(S, dtype=jnp.float32) + 0.5) * s - 0.5
    gy = (cc[:, None] - seeds[None, :, 0]) * aniso[None, :, 0]  # (S, C)
    gx = (cc[:, None] - seeds[None, :, 1]) * aniso[None, :, 1]  # (S, C)
    d2 = gy[:, None, :] ** 2 + gx[None, :, :] ** 2  # (S, S, C)
    neg2, idx2 = jax.lax.top_k(-d2, 2)  # two smallest distances per pixel
    m1, m2, a1 = -neg2[..., 0], -neg2[..., 1], idx2[..., 0]

    d_own = jnp.take(d2, cell, axis=2).transpose(2, 0, 1)  # (B, S, S)
    d_other = jnp.where(
        a1[None] == cell[:, None, None], m2[None], m1[None]
    )
    f = jnp.sqrt(d_other) - jnp.sqrt(d_own)  # signed margin, ~px units
    logits = (f[:, None] + t_vec[None, :, None, None]) * alpha
    iou = jnp.broadcast_to(
        jnp.asarray([0.88, 0.97, 0.92], jnp.float32), (p.shape[0], 3)
    )
    return logits, iou


class DeviceFakeSAM:
    """Voronoi fake masks through the PRODUCTION device selection path.

    Duck-types the ``SamPredictor`` protocol surface that
    ``process_frame.wire_mask_predictor`` consumes (set_image /
    predict_points_with_stats / predict_points_select / select_dispatch /
    select_finish / preload_image / _input_hw) — only the decode is fake:
    ``_fake_lowres_logits`` stands in for the ViT-H encoder + mask decoder,
    and everything downstream (phase-decomposed stability/area statistics,
    smallest-good selection, device box NMS, survivor-only bit-packed
    transfer, DeferredMasks/coverage) is the exact production code reused
    from nets/sam/predictor.py.  This makes fake-frontend e2e runs and the
    honest bench exercise the real keyframe-add path at real mask counts
    with ~none of the host FakeSAM's numpy cost (VERDICT r4 #1/#7).

    Reference workload being proxied: frontend/process_frame.py:207-255
    feeding mask_generation.py:143-288.
    """

    lowres_size = 256  # SAM decoder's low-res logit grid

    def __init__(self, n_cells: int = 48, seed: int = 0,
                 dilate_px: tuple[float, float] = (8.0, 24.0),
                 edge_sharpness: float = 1.0, target_length: int = 1024):
        from ..nets.sam.predictor import (  # production machinery, reused
            _gather_rows_jit, select_from_lowres, stats_from_lowres,
        )
        import functools

        import jax
        import jax.numpy as jnp

        self.n_cells = n_cells
        self.seed = seed
        self.target_length = target_length
        self._t_vec = jnp.asarray([0.0, *dilate_px], jnp.float32)
        self._alpha = jnp.asarray(edge_sharpness, jnp.float32)
        self.params = None  # unused by the fake decode; protocol slot
        self._features = None
        self._input_hw = None
        self._orig_hw = None
        self._cache: dict[tuple[int, int], tuple] = {}
        self._gather_rows = _gather_rows_jit

        S = self.lowres_size
        s = target_length / S

        @functools.partial(jax.jit, static_argnames=("out_size",))
        def _decode_stats(params, features, pts, labels, input_hw, out_size):
            seeds, aniso = features
            lowres, iou = _fake_lowres_logits(
                seeds, aniso, pts, self._t_vec, self._alpha, S, s
            )
            return stats_from_lowres(
                lowres, iou, input_hw, out_size, target_length
            )

        @functools.partial(jax.jit, static_argnames=("out_size",))
        def _decode_select(params, features, pts, labels, input_hw,
                           out_size, iou_thr, stab_thr):
            seeds, aniso = features
            lowres, iou = _fake_lowres_logits(
                seeds, aniso, pts, self._t_vec, self._alpha, S, s
            )
            return select_from_lowres(
                lowres, iou, input_hw, out_size, iou_thr, stab_thr,
                target_length,
            )

        self._decode_stats = _decode_stats
        self._decode_select = _decode_select

    # production prompt-round methods, reused unbound: they only touch the
    # protocol state set up above plus the _decode_stats/_decode_select seams
    def _bind(name):  # noqa: N805 — tiny class-body helper
        from ..nets.sam.predictor import SamPredictor

        return getattr(SamPredictor, name)

    predict_points_with_stats = _bind("predict_points_with_stats")
    predict_points_select = _bind("predict_points_select")
    select_dispatch = _bind("select_dispatch")
    select_finish = _bind("select_finish")
    del _bind

    def preload_image(self, image_hwc_uint8: np.ndarray):
        """No upload needed — the fake never reads pixels."""

    def set_image(self, image_hwc_uint8: np.ndarray):
        import jax.numpy as jnp

        from ..nets.sam.predictor import get_preprocess_shape

        H, W = image_hwc_uint8.shape[:2]
        h2, w2 = get_preprocess_shape(H, W, self.target_length)
        key = (H, W)
        if key not in self._cache:
            # seeds sampled in image coords (same distribution as the host
            # FakeSAM), expressed in input-frame pixels
            r = np.random.default_rng(self.seed)
            seeds = np.stack(
                [r.uniform(0, H, self.n_cells), r.uniform(0, W, self.n_cells)],
                axis=1,
            ) * (h2 / H)
            aniso = r.uniform(0.6, 1.6, (self.n_cells, 2))
            self._cache[key] = (
                jnp.asarray(seeds, jnp.float32), jnp.asarray(aniso, jnp.float32)
            )
        self._features = self._cache[key]
        self._orig_hw = (H, W)
        self._input_hw = (h2, w2)
        self._last_image = image_hwc_uint8


class StructuredFakeFrontend(FrontProcessor):
    """The REAL FrontProcessor running on structured fakes.

    Drop-in for build_frontend's output; additionally implements the
    odometry driver's ``observe(frame)`` hook to feed the frame pose to
    FakeNNET.

    ``device_sam=True`` swaps the host-numpy FakeSAM for DeviceFakeSAM wired
    through ``wire_mask_predictor`` — the production two-phase select
    protocol (device selection + NMS, deferred survivor transfer, BiNI
    overlap) with fake Voronoi logits.
    """

    def __init__(self, config: Config, scene=None, seed: int = 0,
                 n_cells: int = 48, normal_noise: float = 0.0,
                 device_sam: bool = False):
        if scene is None:
            from ..data.synthetic import PlanesScene

            scene = PlanesScene()
        self.scene = scene
        coarse = (
            None if config.frontend.include_normals
            else tuple(config.frontend.normals.integration_shape)
        )
        self._fake_nnet = FakeNNET(scene, noise=normal_noise, coarse_hw=coarse)
        if device_sam:
            from .process_frame import wire_mask_predictor

            mask_fn = wire_mask_predictor(DeviceFakeSAM(
                n_cells=n_cells, seed=seed
            ))
        else:
            mask_fn = FakeSAM(n_cells=n_cells, seed=seed)
        super().__init__(
            config,
            normals_fn=self._fake_nnet,
            mask_predict_fn=mask_fn,
            rng=np.random.default_rng(42 + seed),
        )

    def observe(self, frame: dict):
        img = np.asarray(frame["image"])
        self._fake_nnet.observe(
            np.asarray(frame["T"]), np.asarray(frame["intrinsics"]),
            img.shape[:2],
        )
