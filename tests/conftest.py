"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (SURVEY.md section 2.8 / 5) is validated without TPU
hardware by forcing the host platform to expose 8 CPU devices. Pallas kernels
run in interpreter mode so CPU tests still exercise the kernel code paths.
These env vars must be set before jax initializes, hence this file's import
position (pytest loads conftest before test modules import jax).
"""

import os

# Force-override: the agent environment exports JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("EA_PALLAS_INTERPRET", "1")

import jax  # noqa: E402

# sitecustomize (axon TPU plugin) imports jax at interpreter start, so the
# jax_platforms config default was captured from JAX_PLATFORMS=axon before
# this file ran — the env var alone is ignored. Update the config directly.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# fp32 parity vs torch goldens: forbid low-precision matmul/conv passes.
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Test tiers. The full suite takes ~36 min on this box (interpret-mode
# Pallas + 8-device virtual mesh); `-m smoke` is a <2-min subset with at
# least one broad test per subsystem:
#     python -m pytest tests/ -m smoke -q
# Everything not listed below is implicitly tier "full".
# ---------------------------------------------------------------------------

SMOKE = {
    # samplers (pure scan math)
    "test_samplers.py::test_ddim_tracks_exact_ode",
    "test_samplers.py::test_unipc_tracks_exact_ode",
    "test_samplers.py::test_unipc_scan_matches_eager",
    "test_samplers.py::test_timestep_grids",
    "test_samplers.py::test_add_noise_matches_q_sample_formula",
    # core layers vs torch goldens + one flash-attention case
    "test_core_layers.py::test_group_norm_matches_torch",
    "test_core_layers.py::test_layer_norm_matches_torch",
    "test_core_layers.py::test_conv2d_matches_torch",
    "test_core_layers.py::test_attention_reference_matches_torch_sdpa",
    "test_core_layers.py::test_geglu",
    "test_core_layers.py::test_timestep_embedding_matches_diffusers_formula",
    "test_core_layers.py::test_flash_attention_matches_reference[128-128-40]",
    # tokenizers / prompts / image utils / config
    "test_text_utils.py",                       # whole module (all fast)
    # SAM perception math
    "test_sam.py::test_window_partition_roundtrip",
    "test_sam.py::test_point_labels_gate_embeddings",
    "test_sam.py::test_nms_matches_numpy_reference",
    "test_sam.py::test_select_candidates_matches_numpy_oracle",
    "test_sam.py::test_select_candidates_overflow_and_empty",
    "test_sam.py::test_encode_id_map_matches_show_anns_semantics",
    # native RLE codec
    "test_data.py::TestRLE::test_roundtrip_native",
    "test_data.py::TestRLE::test_native_matches_numpy",
    # models structure
    "test_models.py::test_clip_causal_masking",
    # checkpoints (the full-tree LoRA merge test costs ~60 s; full tier)
    "test_checkpoints.py::TestLoRA::test_unknown_targets_skipped",
    # reference-only control math
    "test_refctrl.py::TestMath",
    # detection stacks (fast unit math)
    "test_swin.py::TestSwin::test_window_partition_roundtrip",
    "test_swin.py::TestSwin::test_rel_pos_index_bounds",
    "test_vlpart.py::TestDetectionOps::test_apply_deltas_shift_scale",
    "test_vlpart.py::TestDetectionOps::test_roi_align_gradient_field",
    "test_groundingdino.py::TestBertTokenizer::test_wordpiece_splits",
    "test_groundingdino.py::TestDeformAttn::test_bilinear_sample_exact",
    # safety head
    "test_safety.py::TestSafetyChecker::test_blackout_semantics",
    # one tiny end-to-end denoise program
    "test_engine.py::test_basic_denoise_runs_and_jits",
}


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "smoke: <2-min subsystem-coverage subset")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        rel = item.nodeid.replace("tests/", "", 1)
        parts = {rel}
        while "::" in rel:
            rel = rel.rsplit("::", 1)[0]
            parts.add(rel)
        if parts & SMOKE:
            item.add_marker(_pytest.mark.smoke)
