"""Test config: run everything on a virtual 8-device CPU mesh.

The environment ships an `axon` TPU PJRT plugin that force-prepends itself
to jax_platforms at import time, so setting JAX_PLATFORMS=cpu in the env is
not enough — we override the config after import, before any backend is
initialized.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: the suite's wall time is dominated by
# XLA CPU compiles (every test jits over the 8-device mesh); caching
# them makes repeat runs several times faster on small hosts.
from ln3diff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(
    os.path.dirname(__file__), '..', '.pytest_cache', 'xla_cache'))

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# smoke tier (-m smoke): a <3-minute curated slice for the driver loop —
# one or two FAST tests per subsystem (the full fast tier costs ~14 min
# on a 1-core host).  Node-id substrings; keep one line per subsystem.
# Measured on the 1-core bench host: 36 tests, ~1.5 min warm xla-cache
# (2 m 35 s under CPU contention; ~3 min cold).  Keep individual entries
# under ~12 s (check with `pytest -m smoke --durations=20`).
# ---------------------------------------------------------------------------

SMOKE_TESTS = (
    # package / config
    'test_package_api.py::TestLazyExports::test_exports_resolve',
    'test_models.py::TestReleasePresets::test_all_release_presets_resolve',
    # conditioning (tokenizer, conditioner; the CLIP-tower forward tests
    # cost ~17 s each on 1 core — fast tier covers them)
    'test_tokenizer.py::TestCLIPBPE::test_full_merge_chain',
    'test_conditioner.py::TestConcatTimestepEmbedder::'
    'test_matches_reference_formula',
    # data (wds, schema, sampler, native loader, eg3d)
    'test_data.py::TestShards::test_write_read_roundtrip',
    'test_data.py::TestPostProcess::test_schema',
    'test_misc_lmdb.py::TestMisc::test_infinite_sampler_sharding',
    'test_native_loader.py::TestNativeShardReader::test_matches_tarfile',
    'test_entries_data.py::TestEG3DDataset::test_folder_roundtrip',
    # render core (fg/bg composition, fused point pipeline, mesh)
    'test_background.py::TestFgBg::test_composition_shapes',
    'test_fused_render.py::TestFusedPointPipeline::'
    'test_reference_matches_jnp_path',
    'test_fused_attention.py::test_sdpa_auto_dispatch',
    'test_mesh.py::TestNativeBuild::test_builds_and_loads',
    'test_mesh.py::TestSparseMarcher::test_empty_field_no_triangles',
    'test_mesh.py::TestSigmaSmoothing::test_chunk_bucketing',
    # networks (the TriplaneVAE e2e and UNet tests cost 25-56 s on
    # 1 core; VAE e2e is covered by the dryrun phase 2 + the
    # integration test below, UNet by the fast tier)
    'test_models.py::TestSDVAE::test_encoder_shapes',
    'test_models.py::TestDiT::test_denoiser_forward[text]',
    'test_models.py::TestDiT::test_dit2_forward',
    'test_stylegan_vit.py::TestModulatedConv::test_matches_loop_reference',
    'test_stylegan_vit.py::TestViT::test_vit_tokens',
    'test_mv_unet.py::TestMVUNet::test_mv_attention_mixes_views',
    # diffusion processes
    'test_dpm_solver.py::TestDPMSolver::test_matches_ddim_and_statistics',
    'test_vpsde.py::TestVPSDE::test_mean_var_consistency',
    'test_vpsde.py::TestResampler::test_loss_aware_warmup_and_bias',
    'test_sgm_config.py::TestLoadT23D::test_edm_loss_fn_runs',
    # training (losses, gan, augment, preemption, decorrelation)
    'test_gan.py::TestGANLosses::test_hinge_loss_separates',
    'test_augment.py::TestBehavior::test_xflip_p_one',
    'test_preemption.py::TestPreemptionGuard::'
    'test_multihost_stop_is_synchronized',
    'test_host_decorrelation.py::TestHostRngDecorrelated::'
    'test_host_rng_differs_by_process',
    # int8 serving (the quantized-DiT e2e test costs ~30 s on 1 core;
    # fast tier covers it)
    'test_int8.py::TestInt8Ops::test_int8_dense_close_to_exact',
    # parallel serving shard
    'test_parallel.py::TestServingShard::'
    'test_points_sharded_match_single_device',
    # end-to-end: wds shards -> train step
    'test_integration_wds.py::test_shards_to_train_step',
    # evaluation / io
    'test_metrics.py::TestFID::test_mean_shift_closed_form',
    'test_inception.py::TestInceptionParity::test_basic_conv2d',
    'test_video.py::TestU8::test_uint8_passthrough_and_range',
    'test_ffhq_vae.py::TestFFHQVAE::test_ffhq_preset_shapes',
)


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        for pat in SMOKE_TESTS:
            if pat in item.nodeid:
                item.add_marker(pytest.mark.smoke)
                matched.add(pat)
    # a curated entry that matches nothing is a stale nodeid — fail loudly
    # (only when the whole suite was collected, not a -k/path selection)
    if len(items) > 300:
        stale = set(SMOKE_TESTS) - matched
        assert not stale, f'stale SMOKE_TESTS entries: {stale}'
