"""Pipelines-layer tests on tiny random models (virtual 8-CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.pipelines import (EditPipeline, GenerationPipeline,
                                        ModelBundle, SketchPipeline,
                                        make_inpaint_condition, random_bundle,
                                        sketch_condition)


@pytest.fixture(scope="module")
def bundle():
    return random_bundle(jax.random.PRNGKey(0), tiny=True,
                         controlnet_names=("sam", "inpaint", "tile"))


def _cond_image(h=96, w=96):
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 5, (h, w)).astype(np.uint16)
    cond = np.zeros((h, w, 3), np.uint8)
    cond[..., 0] = (ids % 256).astype(np.uint8)
    cond[..., 1] = (ids // 256).astype(np.uint8)
    return cond


class TestGenerate:
    def test_generate_shapes_and_range(self, bundle):
        pipe = GenerationPipeline(bundle, controlnet="sam")
        out = pipe(prompt="a photo of a cat", condition_image=_cond_image(),
                   num_samples=2, image_resolution=64, num_steps=3, seed=1)
        assert out.shape == (2, 64, 64, 3)
        assert out.dtype == np.uint8

    def test_seed_determinism(self, bundle):
        pipe = GenerationPipeline(bundle, controlnet="sam")
        a = pipe(prompt="cat", condition_image=_cond_image(),
                 image_resolution=64, num_steps=2, seed=7)
        b = pipe(prompt="cat", condition_image=_cond_image(),
                 image_resolution=64, num_steps=2, seed=7)
        c = pipe(prompt="cat", condition_image=_cond_image(),
                 image_resolution=64, num_steps=2, seed=8)
        np.testing.assert_array_equal(a, b)
        assert (a != c).any()

    def test_program_cache_no_recompile_on_weight_swap(self, bundle):
        pipe = GenerationPipeline(bundle, controlnet="sam")
        pipe(prompt="x", condition_image=_cond_image(),
             image_resolution=64, num_steps=2)
        n0 = len(pipe.cache._programs)
        # hot-swap ControlNet weights (reference rebuilds the pipeline;
        # we must NOT add a compiled program)
        new = jax.tree.map(lambda x: x + 0.01,
                           bundle.controlnets["sam"][1])
        bundle.swap_controlnet("sam", new)
        pipe(prompt="x", condition_image=_cond_image(),
             image_resolution=64, num_steps=2)
        assert len(pipe.cache._programs) == n0

    def test_scale_map_changes_output(self, bundle):
        pipe = GenerationPipeline(bundle, controlnet="sam")
        base = pipe(prompt="x", condition_image=_cond_image(),
                    image_resolution=64, num_steps=2, control_scale=1.0,
                    seed=3)
        zeroed = pipe(prompt="x", condition_image=_cond_image(),
                      image_resolution=64, num_steps=2, control_scale=1.0,
                      scale_map=np.zeros((96, 96), np.float32), seed=3)
        nocn = pipe(prompt="x", condition_image=_cond_image(),
                    image_resolution=64, num_steps=2, control_scale=0.0,
                    seed=3)
        # scale map of zeros == scalar scale 0
        np.testing.assert_array_equal(zeroed, nocn)
        assert (base != zeroed).any()


class TestEdit:
    def _mask(self, h=96, w=96):
        m = np.zeros((h, w), np.uint8)
        m[24:72, 24:72] = 255
        return m

    def _image(self, h=96, w=96):
        rng = np.random.RandomState(1)
        return rng.randint(0, 255, (h, w, 3)).astype(np.uint8)

    def test_edit_blend_shapes(self, bundle):
        pipe = EditPipeline(bundle, controls=("sam", "inpaint"),
                            inpaint_mode="blend")
        out = pipe(image=self._image(), mask=self._mask(), prompt="a cat",
                   condition_image=_cond_image(), num_samples=1,
                   image_resolution=64, num_steps=3,
                   alignment_ratio=0.7, seed=0)
        assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8

    def test_blend_preserves_unmasked_region_in_latents(self, bundle):
        """alignment_ratio None => final paste: outside-mask latents must
        equal the masked-image latents exactly (reference :1658-1664)."""
        pipe = EditPipeline(bundle, controls=("sam", "inpaint"),
                            inpaint_mode="blend")
        img, m, h, w = pipe._prep(self._image(), self._mask(), 64)
        lat = pipe(image=self._image(), mask=self._mask(), prompt="cat",
                   condition_image=_cond_image(), image_resolution=64,
                   num_steps=2, alignment_ratio=None, seed=0,
                   return_latents=True)
        image_latents, mask_latents = pipe._latent_inputs(
            img, m, h, w, 1)
        outside = np.asarray(1.0 - mask_latents)
        np.testing.assert_allclose(
            np.asarray(lat) * outside,
            np.asarray(image_latents, np.float32) * outside,
            rtol=0, atol=2e-2)   # bf16 storage of the pasted latents

    def test_mix_mode_runs(self, bundle):
        pipe = EditPipeline(bundle, controls=("sam", "inpaint"),
                            inpaint_mode="mix")
        out = pipe(image=self._image(), mask=self._mask(), prompt="cat",
                   condition_image=_cond_image(), image_resolution=64,
                   num_steps=3, alignment_ratio=0.7, alpha_weight=0.5,
                   seed=0)
        assert out.shape == (1, 64, 64, 3)

    def test_unet9_mode_runs(self):
        from editanything_tpu.models import config as C
        import dataclasses
        b = random_bundle(jax.random.PRNGKey(2), tiny=True,
                          controlnet_names=("sam", "inpaint"))
        # 9-channel UNet variant: ControlNets stay 4-ch (they see latents
        # only, reference :1607-1615 passes non-inpainting input)
        ucfg9 = dataclasses.replace(b.unet_cfg, in_channels=9)
        from editanything_tpu.models import unet as U
        b9 = ModelBundle(
            unet_cfg=ucfg9, vae_cfg=b.vae_cfg, text_cfg=b.text_cfg,
            unet=U.init_unet(jax.random.PRNGKey(3), ucfg9, b.dtype),
            vae=b.vae, text=b.text, tokenizer=b.tokenizer,
            controlnets=b.controlnets, dtype=b.dtype)
        pipe = EditPipeline(b9, controls=("sam", "inpaint"),
                            inpaint_mode="unet9")
        out = pipe(image=np.zeros((96, 96, 3), np.uint8),
                   mask=np.full((96, 96), 255, np.uint8),
                   prompt="cat", condition_image=_cond_image(),
                   image_resolution=64, num_steps=2, seed=0)
        assert out.shape == (1, 64, 64, 3)

    def test_tile_refine(self, bundle):
        pipe = EditPipeline(bundle, controls=("sam", "inpaint"))
        imgs = np.random.RandomState(0).randint(
            0, 255, (1, 64, 64, 3)).astype(np.uint8)
        refined = pipe.tile_refine(imgs, np.full((64, 64), 255, np.uint8),
                                   "cat", refine_image_resolution=128,
                                   num_steps=2, alignment_ratio=0.5)
        assert len(refined) == 1
        assert refined[0].shape == (128, 128, 3)

    def test_tile_refine_batched_per_sample_conditions(self, bundle):
        """All samples refine as ONE program; each sample is conditioned on
        its own upscaled image, so distinct inputs give distinct outputs."""
        pipe = EditPipeline(bundle, controls=("sam", "inpaint"))
        rs = np.random.RandomState(1)
        imgs = rs.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        refined = pipe.tile_refine(imgs, np.full((64, 64), 255, np.uint8),
                                   "cat", refine_image_resolution=128,
                                   num_steps=2, alignment_ratio=0.5)
        assert len(refined) == 2
        assert refined[0].shape == (128, 128, 3)
        assert not np.array_equal(refined[0], refined[1])


class TestSketch:
    def test_sketch_condition(self):
        img = np.full((32, 32, 3), 255, np.uint8)
        img[4:10, 4:10] = (255, 0, 0)
        img[20:28, 20:28] = (0, 0, 255)
        cond, smap = sketch_condition(
            img, colors=[(255, 0, 0), (255, 255, 255), (0, 0, 255)])
        assert cond[5, 5, 0] == 1 and cond[22, 22, 0] == 2
        assert cond[0, 0, 0] == 0
        assert smap[0, 0] == 0.0 and smap[5, 5] == 1.0

    def test_sketch_pipeline(self, bundle):
        img = np.full((96, 96, 3), 255, np.uint8)
        img[10:40, 10:40] = (200, 30, 30)
        pipe = SketchPipeline(bundle, controlnet="sam")
        out = pipe(sketch=img, prompt="a red square",
                   colors=[(200, 30, 30)], image_resolution=64,
                   num_steps=2, seed=0)
        assert out.shape == (1, 64, 64, 3)

    def test_inpaint_condition(self):
        img01 = np.ones((8, 8, 3), np.float32) * 0.5
        mask = np.zeros((8, 8), np.float32)
        mask[2:4, 2:4] = 1.0
        cond = make_inpaint_condition(img01, mask)
        assert cond[0, 0, 0] == 0.5
        assert cond[2, 2, 0] == -1.0


class TestNonSquare:
    def test_non_square_edit_and_generate(self, bundle):
        """Arbitrary aspect ratios: 96x144 -> 64x128 (64-multiple rounding
        identical to the reference resize_image, annotator/util.py:28-38)."""
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (96, 144, 3)).astype(np.uint8)
        mask = np.zeros((96, 144), np.uint8)
        mask[20:70, 30:100] = 255
        cond = np.zeros((96, 144, 3), np.uint8)
        pipe = EditPipeline(bundle, controls=("sam", "inpaint"))
        out = pipe(image=img, mask=mask, prompt="cat",
                   condition_image=cond, image_resolution=64, num_steps=2,
                   alignment_ratio=0.5, seed=0)
        assert out.shape == (1, 64, 128, 3)
        gen = GenerationPipeline(bundle, controlnet="sam")
        out2 = gen(prompt="cat", condition_image=cond,
                   image_resolution=64, num_steps=2, seed=0)
        assert out2.shape == (1, 64, 128, 3)
