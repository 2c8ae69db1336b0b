"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon, so env vars alone don't switch platforms; we override via
jax.config before any backend initializes (backends are lazy).  The same code
jits on TPU unchanged.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

# Test tiers: `-m quick` is the edit-test loop (~2 min warm); the unmarked
# full run stays the round gate.  Files here compile large while_loop/ViT
# graphs or run end-to-end subprocesses — everything else is quick.
SLOW_FILES = {
    "test_bini.py",
    "test_bini_cropped.py",
    "test_bini_kernel_cg.py",
    "test_cli_sfm.py",
    "test_cli_void.py",
    "test_convert.py",
    "test_day0_rehearsal.py",
    "test_drag_supporting.py",
    "test_gauss_newton.py",
    "test_hf_oracle.py",
    "test_integrated_pipeline.py",
    "test_mapping.py",
    "test_multichip.py",
    "test_nets_frontend.py",
    "test_nnet_decoder_oracle.py",
    "test_odometry.py",
    "test_sam_pipeline.py",
    "test_solver.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
