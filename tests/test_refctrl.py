"""Reference-only control: math units + end-to-end ref-mode edit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.engine import refctrl as R


class TestMath:
    def test_add_freq_feature_identity_at_zero(self):
        k = jax.random.PRNGKey(0)
        ref = jax.random.normal(k, (1, 8, 8, 4))
        tgt = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        out = R.add_freq_feature(ref, tgt, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tgt),
                                   atol=1e-5)

    def test_add_freq_feature_full_ref_magnitude(self):
        """At ratio 1, output magnitudes equal the ref's (phases: target)."""
        ref = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
        tgt = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 2))
        out = R.add_freq_feature(ref, tgt, 1.0)
        mag_out = np.abs(np.fft.fftn(np.asarray(out), axes=(1, 2)))
        mag_ref = np.abs(np.fft.fftn(np.asarray(ref), axes=(1, 2)))
        np.testing.assert_allclose(mag_out, mag_ref, atol=1e-4)

    def test_masked_mean_var_matches_numpy_gather(self):
        x = np.random.RandomState(0).randn(2, 6, 6, 3).astype(np.float32)
        m = np.zeros((1, 6, 6, 1), np.float32)
        m[0, 1:4, 2:5] = 1.0
        mean, var = R.masked_mean_var(jnp.asarray(x), jnp.asarray(m))
        sel = x[:, 1:4, 2:5, :].reshape(2, -1, 3)
        np.testing.assert_allclose(np.asarray(mean)[:, 0, 0],
                                   sel.mean(1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var)[:, 0, 0],
                                   sel.var(1), rtol=1e-4)

    def test_mix_norm_feature_outside_mask_untouched(self):
        cfg = R.RefConfig(style_fidelity=0.0, do_cfg=True)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3),
                        jnp.float32)
        mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
        ref_mean = jnp.ones((1, 1, 1, 3)) * 5.0
        ref_var = jnp.ones((1, 1, 1, 3))
        out = R.mix_norm_feature(x, mask, ref_mean, ref_var, cfg)
        outside = np.asarray(1.0 - mask)
        np.testing.assert_allclose(np.asarray(out) * outside,
                                   np.asarray(x) * outside, atol=1e-6)
        # inside region renormalized to ref stats
        inside = np.asarray(out)[:, 2:6, 2:6, :]
        np.testing.assert_allclose(inside.mean((1, 2)), 5.0, atol=1e-3)

    def test_mix_norm_style_fidelity_keeps_uncond(self):
        """fidelity=1 + CFG: the uncond half keeps original features."""
        cfg = R.RefConfig(style_fidelity=1.0, do_cfg=True)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 3),
                        jnp.float32)
        mask = jnp.ones((1, 8, 8, 1))
        ref_mean = jnp.zeros((2, 1, 1, 3))
        ref_var = jnp.ones((2, 1, 1, 3))
        out = R.mix_norm_feature(x, mask, ref_mean, ref_var, cfg)
        np.testing.assert_allclose(np.asarray(out)[:2], np.asarray(x)[:2],
                                   atol=1e-6)
        assert not np.allclose(np.asarray(out)[2:], np.asarray(x)[2:])


class TestWeights:
    def test_attn_weights_sorted_desc(self):
        w = R.attn_weights((320, 640, 1280, 1280, 640, 320))
        # widest blocks get the smallest weights (hooked first)
        assert w[2] == 0.0 and w[3] == 1 / 6
        assert {w[0], w[5]} == {4 / 6, 5 / 6}

    def test_unet_attn_weights_sd15(self):
        from editanything_tpu.models.config import sd15_unet
        w = R.unet_attn_weights(sd15_unet())
        assert len(w) == 16
        assert w["mid"] < w["down.0.0"]      # 1280-dim before 320-dim
        assert max(w.values()) == 15 / 16


class TestEndToEnd:
    def test_ref_mode_edit_runs_and_differs(self):
        from editanything_tpu.pipelines import EditPipeline, random_bundle
        b = random_bundle(jax.random.PRNGKey(0), tiny=True,
                          controlnet_names=("sam", "inpaint"))
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (96, 96, 3)).astype(np.uint8)
        cond = np.zeros((96, 96, 3), np.uint8)
        mask = np.zeros((96, 96), np.uint8)
        mask[24:72, 24:72] = 255
        ref = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        rmask = np.full((64, 64), 255, np.uint8)

        pipe = EditPipeline(b, controls=("sam", "inpaint"))
        base = pipe(image=img, mask=mask, prompt="cat",
                    condition_image=cond, image_resolution=64, num_steps=2,
                    alignment_ratio=0.7, seed=0)
        with_ref = pipe(image=img, mask=mask, prompt="cat",
                        condition_image=cond, image_resolution=64,
                        num_steps=2, alignment_ratio=0.7, seed=0,
                        ref_image=ref, ref_mask=rmask, ref_prompt="a dog",
                        reference_attn=True, reference_adain=True,
                        style_fidelity=0.5, ref_scale=0.2)
        assert with_ref.shape == base.shape
        assert (with_ref != base).any()

    def test_ref_attn_only_mode(self):
        from editanything_tpu.pipelines import EditPipeline, random_bundle
        b = random_bundle(jax.random.PRNGKey(2), tiny=True,
                          controlnet_names=("sam", "inpaint"))
        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        pipe = EditPipeline(b, controls=("sam", "inpaint"))
        out = pipe(image=img, mask=np.full((64, 64), 255, np.uint8),
                   prompt="x", condition_image=np.zeros((64, 64, 3), np.uint8),
                   image_resolution=64, num_steps=2, alignment_ratio=0.5,
                   ref_image=img, ref_mask=np.full((64, 64), 255, np.uint8),
                   reference_attn=True, reference_adain=False, seed=0)
        assert out.shape == (1, 64, 64, 3)
