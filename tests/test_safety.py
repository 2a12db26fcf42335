"""Safety checker: converter structure, HF CLIPVisionModel golden parity,
and the concept-score head vs a numpy oracle.

The reference registers StableDiffusionSafetyChecker as an optional pipeline
component (utils/stable_diffusion_controlnet_inpaint.py:391-454) but runs
with safety_checker=None everywhere (editany_lora.py:369-411); this suite
validates our full port of the capability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from editanything_tpu.checkpoints.convert import safety_checker_to_tree
from editanything_tpu.models import safety as S

TINY = S.tiny_vision_config()


def _tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out |= _tree_paths(v, p)
        else:
            out.add((p, tuple(np.shape(v))))
    return out


def _hf_tiny():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    cfg = CLIPVisionConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        image_size=TINY.image_size, patch_size=TINY.patch_size,
        projection_dim=TINY.projection_dim)
    torch.manual_seed(0)
    return CLIPVisionModel(cfg).eval()


def _full_sd(hf_model):
    """Compose a StableDiffusionSafetyChecker-layout state dict: the HF
    vision tower + projection/concept buffers.

    The real class nests CLIPVisionModel under an attribute also named
    vision_model, so tower keys carry a DOUBLED prefix
    (vision_model.vision_model.embeddings...) — mirror that exactly by
    wrapping the tower in a module whose attribute is named vision_model."""
    rng = np.random.default_rng(0)
    wrapper = torch.nn.Module()
    wrapper.vision_model = hf_model
    sd = {k: v.numpy() for k, v in wrapper.state_dict().items()}
    sd["visual_projection.weight"] = rng.normal(
        0, 0.05, (TINY.projection_dim, TINY.hidden_size)).astype(np.float32)
    sd["concept_embeds"] = rng.normal(
        0, 1, (TINY.num_concepts, TINY.projection_dim)).astype(np.float32)
    sd["special_care_embeds"] = rng.normal(
        0, 1, (TINY.num_special, TINY.projection_dim)).astype(np.float32)
    sd["concept_embeds_weights"] = rng.uniform(
        0.1, 0.3, TINY.num_concepts).astype(np.float32)
    sd["special_care_embeds_weights"] = rng.uniform(
        0.1, 0.3, TINY.num_special).astype(np.float32)
    return sd


class TestSafetyChecker:
    def test_converter_structure_matches_init(self):
        tree = safety_checker_to_tree(_full_sd(_hf_tiny()))
        want = S.init_safety_checker(jax.random.PRNGKey(0), TINY)
        assert _tree_paths(tree) == _tree_paths(want)

    def test_vision_tower_matches_hf(self):
        hf = _hf_tiny()
        tree = safety_checker_to_tree(_full_sd(hf))
        rng = np.random.default_rng(1)
        px = rng.normal(0, 1, (2, TINY.image_size, TINY.image_size, 3)) \
            .astype(np.float32)
        got = S.vision_pooled(tree, TINY, jnp.asarray(px))
        with torch.no_grad():
            want = hf(pixel_values=torch.from_numpy(
                px.transpose(0, 3, 1, 2))).pooler_output
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=2e-5, rtol=2e-5)

    def test_head_matches_numpy_oracle(self):
        hf = _hf_tiny()
        sd = _full_sd(hf)
        tree = safety_checker_to_tree(sd)
        rng = np.random.default_rng(2)
        px = rng.normal(0, 1, (3, TINY.image_size, TINY.image_size, 3)) \
            .astype(np.float32)
        nsfw, scores = S.check(tree, TINY, jnp.asarray(px))

        # oracle: torch tower pooled -> numpy head (diffusers forward math)
        with torch.no_grad():
            pooled = hf(pixel_values=torch.from_numpy(
                px.transpose(0, 3, 1, 2))).pooler_output.numpy()
        emb = pooled @ sd["visual_projection.weight"].T

        def cos(a, b):
            a = a / np.linalg.norm(a, axis=-1, keepdims=True)
            b = b / np.linalg.norm(b, axis=-1, keepdims=True)
            return a @ b.T

        special = cos(emb, sd["special_care_embeds"]) - \
            sd["special_care_embeds_weights"][None]
        adj = np.where(np.any(special > 0, axis=1, keepdims=True), 0.01, 0.0)
        concept = cos(emb, sd["concept_embeds"]) - \
            sd["concept_embeds_weights"][None] + adj
        np.testing.assert_allclose(np.asarray(scores), concept,
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(nsfw),
                                      np.any(concept > 0, axis=1))

    def test_blackout_semantics(self):
        """Flagged images are zeroed, clean images untouched."""
        params = S.init_safety_checker(jax.random.PRNGKey(3), TINY)
        rng = np.random.default_rng(4)
        imgs = rng.integers(0, 256, (4, 40, 48, 3)).astype(np.uint8)
        checker = S.SafetyChecker(params, TINY)
        out, nsfw = checker(imgs)
        assert out.shape == imgs.shape and nsfw.shape == (4,)
        for i in range(4):
            if nsfw[i]:
                assert (out[i] == 0).all()
            else:
                np.testing.assert_array_equal(out[i], imgs[i])
        # force a flag: thresholds at -1 fire on everything
        params2 = dict(params)
        params2["concept_embeds_weights"] = \
            jnp.full_like(params["concept_embeds_weights"], -1.0)
        out2, nsfw2 = S.SafetyChecker(params2, TINY)(imgs)
        assert nsfw2.all() and (out2 == 0).all()


def test_pipeline_surfaces_nsfw_flags():
    """A bundle with a loaded checker: pipelines black out flagged images
    and expose per-image flags as pipe.last_nsfw (diffusers' has_nsfw
    return, surfaced as an attribute on our array-out API)."""
    import dataclasses

    from editanything_tpu.models.safety import SafetyChecker
    from editanything_tpu.pipelines import GenerationPipeline
    from editanything_tpu.pipelines.bundle import random_bundle

    params = S.init_safety_checker(jax.random.PRNGKey(0), TINY)
    # thresholds at -1 fire on every image
    params["concept_embeds_weights"] = \
        jnp.full_like(params["concept_embeds_weights"], -1.0)
    checker = SafetyChecker(params, TINY)
    bundle = dataclasses.replace(
        random_bundle(jax.random.PRNGKey(1), tiny=True,
                      controlnet_names=("sam",)), safety=checker)
    pipe = GenerationPipeline(bundle, controlnet="sam")
    assert pipe.last_nsfw is None
    out = pipe(prompt="x", condition_image=np.zeros((64, 64, 3), np.uint8),
               num_samples=2, image_resolution=64, num_steps=2, seed=0)
    assert (out == 0).all()
    assert pipe.last_nsfw.tolist() == [True, True]
