"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the mapping
step executes with bundle points sharded over 'sp' and targets over 'dp',
producing the same numbers as the unsharded run (XLA inserts the
collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from super_primitive_tpu.keyframe import build_bundle_np
from super_primitive_tpu.lie import se3
from super_primitive_tpu.odometry import mapper, window
from super_primitive_tpu.parallel.mesh import make_mesh, replicated, shard_window

from test_mapping import window_setup  # fixture reuse  # noqa: F401


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


shard_buffers = shard_window  # library helper (parallel/mesh.py)


class TestShardedMapping:
    def test_matches_unsharded(self, window_setup, mesh):
        buf, gt_poses, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        args = (
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
            jnp.asarray(1e-4), jnp.asarray(1e-2), jnp.asarray(1e-5),
            jnp.asarray(25), jnp.asarray(False), False,
        )
        res_plain = mapper.run_mapping(buf, *args, geo_dims)

        buf_sharded = shard_buffers(buf, mesh)
        with mesh:
            res_sharded = mapper.run_mapping(buf_sharded, *args, geo_dims)

        np.testing.assert_allclose(
            np.asarray(res_plain.params.poses),
            np.asarray(res_sharded.params.poses), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res_plain.params.kp_logdepth),
            np.asarray(res_sharded.params.kp_logdepth), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res_plain.losses), np.asarray(res_sharded.losses),
            atol=1e-4,
        )

    def test_mesh_shape(self, mesh):
        assert dict(mesh.shape) == {"dp": 2, "sp": 4}


class TestDriverContract:
    def test_dryrun_multichip_clean_subprocess(self):
        """The driver's exact invocation: a fresh process with NO conftest
        help and NO XLA flags — dryrun_multichip(8) must self-bootstrap a
        virtual 8-device CPU mesh and exit 0."""
        import os
        import subprocess
        import sys

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "_SP_TPU_DRYRUN_BOOTSTRAPPED")
        }
        # Simulate the driver environment: single-device platform selected,
        # no forced host device count.  (CPU here to keep tests hermetic; on
        # the driver's axon platform the same < n check triggers bootstrap.)
        env["JAX_PLATFORMS"] = "cpu"
        code = (
            "import sys; sys.path.insert(0, %r); "
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(8)" % repo_root
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            cwd=repo_root,
            capture_output=True,
            text=True,
            # two large while_loop graphs compile on CPU; cold-cache compiles
            # took >600 s under load (the dryrun now persists them in
            # .jax_cache, so repeat runs are seconds)
            timeout=1500,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "dryrun_multichip OK" in proc.stdout, proc.stdout


class TestShardedPromptDecode:
    """The SAM prompt decode is embarrassingly parallel over prompts: the
    (chunk, ...) batch shards over all devices with params/features
    replicated and zero collectives — the frontend's multi-chip axis
    (docs/SCALING.md)."""

    def test_decode_select_matches_unsharded(self, mesh):
        from super_primitive_tpu.nets.sam.image_encoder import (
            VIT_TINY_TEST, ImageEncoderViT,
        )
        from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
        from super_primitive_tpu.nets.sam.predictor import SamPredictor
        from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

        cfg = VIT_TINY_TEST
        S = cfg.img_size // cfg.patch_size
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        params = {
            "image_encoder": ImageEncoderViT(cfg).init(
                k1, jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
            )["params"],
            "prompt_encoder": PromptEncoder(
                embed_dim=cfg.out_chans, image_embedding_size=(S, S),
                input_image_size=(cfg.img_size, cfg.img_size),
            ).init(k2, jnp.zeros((1, 2, 2)), jnp.zeros((1, 2)))["params"],
            "mask_decoder": MaskDecoder(transformer_dim=cfg.out_chans).init(
                k3, jnp.zeros((1, S, S, cfg.out_chans)),
                jnp.zeros((1, S, S, cfg.out_chans)),
                jnp.zeros((2, 2, cfg.out_chans)),
                jnp.zeros((2, S, S, cfg.out_chans)),
            )["params"],
        }
        pred = SamPredictor(params, cfg)
        image = np.random.default_rng(3).integers(0, 255, (48, 60, 3), np.uint8)
        pred.set_image(image)

        r = np.random.default_rng(4)
        pts = np.concatenate(
            [(r.random((8, 1, 2)) * 40).round(), np.zeros((8, 1, 2))], axis=1
        ).astype(np.float32)
        labels = np.concatenate(
            [np.ones((8, 1)), -np.ones((8, 1))], axis=1
        ).astype(np.float32)
        input_hw = jnp.asarray(pred._input_hw)
        thr = jnp.asarray(0.0, jnp.float32)
        args = (pred.params, pred._features, jnp.asarray(pts),
                jnp.asarray(labels), input_hw, cfg.img_size, thr, thr)

        plain = pred._decode_select(*args)
        prompt_sharded = NamedSharding(mesh, P(("dp", "sp")))
        with mesh:
            shard = pred._decode_select(
                pred.params, pred._features,
                jax.device_put(jnp.asarray(pts), prompt_sharded),
                jax.device_put(jnp.asarray(labels), prompt_sharded),
                input_hw, cfg.img_size, thr, thr,
            )
        names = ("packed", "iou", "valid", "boxes", "pick")
        for a, b, n in zip(plain, shard, names):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-4, rtol=1e-4, err_msg=n,
            )


class TestShardedSamEncode:
    """The SAM image encoder shards its image batch over dp (per-image work
    independent, params replicated) — the layout _dryrun_sharded_sam_encode
    exercises under the driver contract."""

    def test_encode_matches_unsharded(self, mesh):
        from super_primitive_tpu.nets.sam.image_encoder import (
            VIT_TINY_TEST, ImageEncoderViT,
        )

        enc = ImageEncoderViT(VIT_TINY_TEST)
        B = 2 * int(mesh.shape["dp"])
        r = np.random.default_rng(3)
        imgs = jnp.asarray(
            r.uniform(0, 1, (B, VIT_TINY_TEST.img_size, VIT_TINY_TEST.img_size, 3))
            .astype(np.float32)
        )
        params = jax.jit(enc.init)(jax.random.PRNGKey(0), imgs[:1])["params"]
        apply = jax.jit(lambda p, x: enc.apply({"params": p}, x))
        plain = apply(params, imgs)
        with mesh:
            shard = apply(
                jax.device_put(params, replicated(mesh)),
                jax.device_put(imgs, NamedSharding(mesh, P("dp"))),
            )
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(shard), atol=1e-5, rtol=1e-5
        )


class TestShardedGNMapping:
    """The GN/LM performance path distributes the same way: points over sp,
    pointwise linearization local, reductions psum over ICI."""

    def _args(self, buf):
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        return (
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
        )

    def test_assemble_matches_unsharded(self, window_setup, mesh):
        """The linearization pass (no accept/reject branching) must agree
        closely — real drift here is a sharding bug.  Tolerance is 1e-4
        (not tighter): the factored assemble reduces H from rank-2 point
        factors, and GSPMD's per-shard partial sums reassociate that f32
        reduction (observed worst case ~8e-5 abs on H entries of O(1e2))."""
        from super_primitive_tpu.solve import gn_mapping as gm

        buf, _, geo_dims = window_setup
        trg_index, trg_valid, src_valid, xi_m, ld_m, aff_m = self._args(buf)
        par_mask = jnp.concatenate([jnp.repeat(xi_m, 6), jnp.repeat(aff_m, 2)])

        def run(b):
            trg_images = b.image_pool()[trg_index]
            src_samples = b.source_samples(geo_dims)
            return gm.assemble(
                b, trg_index, trg_valid, src_valid, trg_images, src_samples,
                par_mask, geo_dims, False,
                b.pose_pool(), b.kp_logdepth, b.affine_pool(),
            )

        plain = jax.jit(run)(buf)
        with mesh:
            sharded = jax.jit(run)(shard_window(buf, mesh))
        for a, b, name in zip(
            plain, sharded, ["H", "g_t", "D", "gl", "Bs", "cost"]
        ):
            # H accumulates across sharded point partitions (different
            # reduction order): observed worst case ~8e-5 absolute — keep
            # the bound near that; everything else stays tight (ADVICE r4)
            atol = 2e-4 if name == "H" else 1e-5
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=atol, rtol=1e-5,
                err_msg=name,
            )

    def test_gn_solve_matches_unsharded(self, window_setup, mesh):
        from super_primitive_tpu.solve.gn_mapping import gn_mapping

        buf, _, geo_dims = window_setup
        args = self._args(buf)
        res_plain = gn_mapping(buf, *args, geo_dims, max_iters=5, tol=0.0)
        with mesh:
            res_shard = gn_mapping(
                shard_window(buf, mesh), *args, geo_dims, max_iters=5, tol=0.0
            )
        assert np.isfinite(float(res_shard.final_cost))
        # LM accept/reject can amplify reduction-order noise across 5 iters;
        # the solves must still land on the same optimum
        np.testing.assert_allclose(
            np.asarray(res_plain.poses), np.asarray(res_shard.poses), atol=1e-3
        )
        np.testing.assert_allclose(
            float(res_plain.final_cost), float(res_shard.final_cost),
            rtol=1e-3,
        )

    def test_sharded_fused_step_matches_unsharded(self, window_setup, mesh):
        """The fused steady-state frame step (track + supp refresh + supp
        refinement + gating in one dispatch) under the mesh: sp-sharded
        bundle gathers and reductions must reproduce the single-device
        numbers (guards the whole per-frame path, VERDICT r2 #8)."""
        from super_primitive_tpu.odometry.fused_step import fused_frame_step

        buf, _, geo_dims = window_setup
        trg_image = jnp.asarray(np.asarray(buf.supp_images[2, 0]))
        supp_valid = np.zeros_like(np.asarray(buf.supp_valid))
        supp_valid[2, 0] = True
        slots = mapper.build_slots(3, 3, supp_valid, "supp")
        args = (
            jnp.asarray(2), trg_image,
            jnp.asarray(np.asarray(buf.poses[2]), jnp.float32),
            jnp.zeros(2), trg_image, jnp.eye(4), jnp.zeros(2),
            jnp.asarray(False),
            jnp.asarray(slots.trg_index[2]), jnp.asarray(slots.trg_valid[2]),
            geo_dims, (0, 1), 0, 2,
        )
        kw = dict(max_iters=4, supp_max_iters=3, use_affine=False)
        _, packed_plain, ld_plain = fused_frame_step(buf, *args, **kw)
        with mesh:
            _, packed_shard, ld_shard = fused_frame_step(
                shard_window(buf, mesh), *args, **kw
            )
        np.testing.assert_allclose(
            np.asarray(packed_plain), np.asarray(packed_shard),
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ld_plain), np.asarray(ld_shard), atol=1e-4
        )

    def test_collectives_present(self, window_setup, mesh):
        """Prove the sharded solve actually distributes: the compiled HLO
        must contain cross-device all-reduces."""
        from super_primitive_tpu.solve.gn_mapping import gn_mapping

        buf, _, geo_dims = window_setup
        args = self._args(buf)
        with mesh:
            lowered = jax.jit(
                lambda b: gn_mapping(b, *args, geo_dims, max_iters=2, tol=0.0)
            ).lower(shard_window(buf, mesh))
            hlo = lowered.compile().as_text()
        assert "all-reduce" in hlo or "reduce-scatter" in hlo, (
            "no collectives in compiled HLO — inputs not actually sharded?"
        )


class TestShardedBini:
    """BiNI with the segment axis sharded over sp == the unsharded solve
    (the CG while_loop's convergence test contracts over segments -> psum)."""

    def _case(self):
        H, Wd, N = 24, 32, 8
        r = np.random.default_rng(5)
        K = jnp.asarray(
            [[1.2 * Wd, 0, Wd / 2], [0, 1.2 * Wd, H / 2], [0, 0, 1.0]],
            jnp.float32,
        )
        n = r.normal(size=(H, Wd, 3)).astype(np.float32)
        n[..., 2] = -np.abs(n[..., 2]) - 1.0
        normals = jnp.asarray(n / np.linalg.norm(n, axis=-1, keepdims=True))
        masks = np.zeros((N, H, Wd), bool)
        for i in range(N):
            r0, c0 = 2 + (i % 3) * 4, 2 + (i % 4) * 6
            masks[i, r0 : r0 + 8, c0 : c0 + 8] = True
        return normals, masks, K

    def test_matches_unsharded(self, mesh):
        from super_primitive_tpu.integrate.bini import BiniConfig, integrate_normals

        normals, masks, K = self._case()
        cfg = BiniConfig(cg_max_iter=40, cg_tol=1e-5)
        ref = np.asarray(integrate_normals(normals, jnp.asarray(masks), K, cfg))
        with mesh:
            masks_d = jax.device_put(
                jnp.asarray(masks), NamedSharding(mesh, P("sp"))
            )
            normals_d = jax.device_put(normals, replicated(mesh))
            out = np.asarray(integrate_normals(normals_d, masks_d, K, cfg))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_cropped_matches_unsharded(self, mesh):
        from super_primitive_tpu.integrate.bini import (
            BiniConfig,
            integrate_normals_cropped,
        )

        normals, masks, K = self._case()
        cfg = BiniConfig(cg_max_iter=40, cg_tol=1e-5)
        ref = np.asarray(
            integrate_normals_cropped(normals, jnp.asarray(masks), K, cfg, crop=16)
        )
        with mesh:
            masks_d = jax.device_put(
                jnp.asarray(masks), NamedSharding(mesh, P("sp"))
            )
            normals_d = jax.device_put(normals, replicated(mesh))
            out = np.asarray(
                integrate_normals_cropped(normals_d, masks_d, K, cfg, crop=16)
            )
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestShardedCC:
    def test_matches_scipy(self, mesh):
        from scipy import ndimage

        from super_primitive_tpu.ops.connected_components import label_components

        r = np.random.default_rng(9)
        masks = r.uniform(size=(8, 24, 32)) < 0.4
        with mesh:
            masks_d = jax.device_put(
                jnp.asarray(masks), NamedSharding(mesh, P("sp"))
            )
            labels = np.asarray(label_components(masks_d))
        structure = np.asarray([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        for i in range(8):
            ref, n_ref = ndimage.label(masks[i], structure=structure)
            # same partition: component count and co-membership agree
            # (labels are root linear indices: background -1, foreground >= 0)
            got = labels[i]
            assert (got >= 0).sum() == (ref > 0).sum()
            assert len(np.unique(got[got >= 0])) == n_ref
            for lbl in np.unique(ref[ref > 0]):
                vals = np.unique(got[ref == lbl])
                assert len(vals) == 1, (i, lbl, vals)
