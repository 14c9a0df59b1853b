"""Test config: run on CPU with 8 virtual devices so sharding tests need no TPU.

The environment pre-registers an 'axon' TPU backend via sitecustomize and
sets JAX_PLATFORMS=axon, so a plain env-var default is not enough — we
force the platform through jax.config before any device is touched.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Tiering: the smoke tier (pytest -m "not slow") must stay FAST (~2-3 min)
# or nobody runs it (VERDICT r3 weak #4). Rather than scattering markers
# over 20 files, every node matching a pattern below is marked slow here;
# the full suite (no -m filter) is the nightly tier. Patterns were chosen
# from --durations=60 of the full run: whole-pipeline e2e, multi-device
# trainers, real-architecture nets, and the heaviest oracle variants. The
# smoke tier keeps at least one fast representative of every subsystem
# (forward/grad parity at small sizes, binning, cull, schedulers, scene,
# config, meshing units, tiny-guidance math).
_SLOW_PATTERNS = (
    "test_golden_e2e.py",          # full two-stage pipeline (fixture ~40 s)
    "test_multihost.py",           # spawns 2 jax.distributed processes
    "test_webapp.py",              # HTTP server + stage-1 job
    "test_live_viewer.py",         # HTTP live-train viewer
    "test_cli.py::TestTwoStagePipeline",
    "test_cli.py::TestMeshCLI::test_stage1_cli_on_mesh",
    "test_cli.py::TestGuidanceModes",
    "test_cli.py::TestSh1Checkpoint",
    "test_cli.py::TestSamplers",
    "test_torch_oracle.py::TestTinyLDM",      # 25 s oracles; diffusers tier stays
    "test_loader_native.py::TestConvertShapes",
    "test_loader_native.py::TestImageDreamNative",
    "test_loader_native.py::TestMVDreamNative",
    "test_parallel.py::TestMeshTrainer",
    "test_parallel.py::TestMeshHostSplitDensify",
    "test_parallel.py::TestDP::test_matches_single_device_gradient_math",
    "test_tile_shard.py::TestTileShard::test_gradients_match_single_device",
    "test_stage1.py::TestParamPassingGuidance",
    "test_stage1.py::TestScanTraining",
    "test_stage2.py::TestMeshRenderer::test_ssaa_changes_nothing_much",
    "test_stage2.py::TestTargetSSAAQuality",
    "test_stage2.py::TestParamPassingRefine",
    "test_stage2.py::TestStage2Training",
    "test_stage2.py::TestExportPipeline",
    "test_rasterize.py::TestGradParity::test_param_grads_match_reference",
    "test_rasterize.py::TestGradParity::test_reference_grads_numerical",
    "test_rasterize.py::TestOverflow",
    "test_rasterize.py::TestTile32",
    "test_cuda_parity.py::test_forward_and_grads_match_cuda",
    "test_convert.py::test_unet_convert_matches_init_tree",
    "test_guidance.py::TestFullArchitectures",
    "test_mesh_raster.py::TestMipmap::test_render_mesh_mipmap_end_to_end",
    "test_mesh_raster.py::TestAntialias",
    "test_checkpoint_render.py",
    "test_weights_day.py",         # full real-checkpoint path rehearsal
    "test_meshing.py::TestDecimate",
    "test_meshing.py::TestRemesh",
    "test_u2net.py::TestU2NetTraining",
    # second pass (smoke-tier --durations): keep one representative of
    # each oracle family, push the heavier twin to the nightly tier
    "test_tile_shard.py::TestTileShard::test_forward_matches_single_device",
    "test_stage2.py::TestMeshRenderer::test_render_outputs",
    "test_torch_oracle.py::TestTinyDiffusers::test_unet",
    "test_text_parity.py",
    "test_rasterize.py::TestForwardParity::test_image_matches_dense_reference[1]",
    "test_rasterize.py::TestEllipseCull::test_grads_identical_with_cull",
    "test_rasterize.py::TestGradParity::test_mean2d_tap",
    "test_rasterize.py::TestForwardParity::test_empty_scene",
    "test_convert.py::test_vae_convert_matches_init_tree",
    "test_torch_oracle.py::TestRefineDDIM::test_zero123_refine_matches_torch[0.8]",
    "test_cli.py::TestSHDegree",
    "test_torch_oracle.py::TestTinyDiffusers",
    "test_stage2.py::TestMeshRenderer::test_texture_gradients",
    "test_guidance.py::TestImageDreamGuidance",
    "test_scene.py::TestDensify::test_capacity_overflow_drops_extras",
    "test_mesh_raster.py::TestRasterize::test_perspective_scene_matches",
    "test_grid_put.py::TestMipmap3D",
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        nid = item.nodeid
        if any(p in nid for p in _SLOW_PATTERNS):
            item.add_marker(_pytest.mark.slow)
