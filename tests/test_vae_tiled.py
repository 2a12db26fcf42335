"""Tiled VAE encode/decode (the reference's vae-slicing analog).

The reference frees memory with vae.enable_slicing
(/root/reference/utils/stable_diffusion_controlnet_inpaint.py:454-461) and
diffusers' enable_vae_tiling; our TPU analog tiles the model over
overlapping windows inside one lax.scan (models/vae.py decode_tiled /
encode_tiled) so the 4096^2-8192^2 tile-refine buckets
(editany_demo.py:241-247) fit one chip's HBM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.models import config as C
from editanything_tpu.models import vae as V
from editanything_tpu.pipelines import EditPipeline, random_bundle
from editanything_tpu.pipelines.generate import ProgramCache

CFG = C.VAEConfig(block_out_channels=(8, 16, 16, 32), latent_channels=4,
                  layers_per_block=1, norm_num_groups=4)


@pytest.fixture(scope="module")
def vae_params():
    return V.init_vae(jax.random.PRNGKey(0), CFG)


def test_tile_starts_cover_and_clamp():
    assert V._tile_starts(64, 128, 96) == [0]
    starts = V._tile_starts(512, 128, 96)
    assert starts[0] == 0 and starts[-1] == 512 - 128
    covered = np.zeros(512, bool)
    for s in starts:
        covered[s:s + 128] = True
    assert covered.all()
    # stride-aligned end: no duplicate of the clamped last tile
    assert len(set(starts)) == len(starts)


def test_blend_weight_interior_one_edges_ramp():
    w = np.asarray(V._blend_weight(16, 16, 4, 4))[..., 0]
    assert np.allclose(w[8, 8], 1.0)
    assert w[0, 8] < w[1, 8] < w[3, 8] < 1.0
    assert np.allclose(w, w[::-1, ::-1])  # symmetric


def test_blend_weight_per_dim():
    # one dim untiled (no ramp), the other tiled: ramp only along w
    w = np.asarray(V._blend_weight(8, 16, 0, 4))[..., 0]
    assert np.allclose(w[:, 8], 1.0)
    assert w[3, 0] < w[3, 3] < 1.0


def test_decode_tiled_panorama_non_square(vae_params):
    """Wide input where h < tile <= w (the advisor's 512x2560 repro shape,
    scaled down): per-dim tile clamping must make this trace and run."""
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 40, 4)) * 0.1
    full = np.asarray(V.decode(vae_params, CFG, z), np.float32)
    tiled = np.asarray(
        V.decode_tiled(vae_params, CFG, z, tile=16, overlap=8), np.float32)
    assert tiled.shape == full.shape == (1, 64, 320, 3)
    assert np.isfinite(tiled).all()
    assert np.abs(tiled - full).mean() < 0.05 * np.abs(full).max()
    # tall variant (w < tile <= h)
    zt = jnp.swapaxes(z, 1, 2)
    tall = np.asarray(
        V.decode_tiled(vae_params, CFG, zt, tile=16, overlap=8), np.float32)
    assert tall.shape == (1, 320, 64, 3) and np.isfinite(tall).all()


def test_encode_tiled_panorama_non_square(vae_params):
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 320, 3)) * 0.2
    pf = V.encode(vae_params, CFG, x)
    pt = V.encode_tiled(vae_params, CFG, x, tile=128, overlap=64)
    assert pt.mean.shape == pf.mean.shape == (1, 8, 40, 4)
    assert np.isfinite(np.asarray(pt.mean)).all()
    scale = np.abs(np.asarray(pf.mean)).max()
    assert np.abs(np.asarray(pt.mean) - np.asarray(pf.mean)).mean() \
        < 0.1 * scale


def test_decode_tiled_single_tile_exact(vae_params):
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 0.2
    full = V.decode(vae_params, CFG, z)
    tiled = V.decode_tiled(vae_params, CFG, z, tile=16, overlap=4)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))


def test_decode_tiled_multi_tile_close_to_full(vae_params):
    # smooth-ish latent so per-tile GroupNorm stats approximate the global
    # ones; the remaining diff is the documented tiled-VAE approximation
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 40, 4)) * 0.1
    full = np.asarray(V.decode(vae_params, CFG, z), np.float32)
    tiled = np.asarray(jax.jit(
        lambda p, zz: V.decode_tiled(p, CFG, zz, tile=16, overlap=8)
    )(vae_params, z), np.float32)
    assert tiled.shape == full.shape == (2, 192, 320, 3)
    assert np.isfinite(tiled).all()
    scale = np.abs(full).max()
    assert np.abs(tiled - full).mean() < 0.05 * scale


def test_encode_tiled_close_to_full(vae_params):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 192, 320, 3)) * 0.2
    pf = V.encode(vae_params, CFG, x)
    pt = V.encode_tiled(vae_params, CFG, x, tile=128, overlap=64)
    assert pt.mean.shape == pf.mean.shape == (1, 24, 40, 4)
    assert np.isfinite(np.asarray(pt.mean)).all()
    scale = np.abs(np.asarray(pf.mean)).max()
    assert np.abs(np.asarray(pt.mean) - np.asarray(pf.mean)).mean() \
        < 0.1 * scale
    assert np.abs(np.asarray(pt.logvar) - np.asarray(pf.logvar)).mean() \
        < 0.1 * np.abs(np.asarray(pf.logvar)).max()


def test_encode_tiled_rejects_misaligned(vae_params):
    x = jnp.zeros((1, 200, 200, 3))
    with pytest.raises(ValueError):
        V.encode_tiled(vae_params, CFG, x, tile=100, overlap=50)


def test_decode_from_latents_tile_dispatch(vae_params):
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
    a = V.decode_from_latents(vae_params, CFG, z)
    b = V.decode_from_latents(vae_params, CFG, z, tile=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPipelineTiledPath:
    """Drive the REAL pipeline with the one-shot bound patched low so tiny
    shapes exercise the tiled encode + in-program tiled decode."""

    @pytest.fixture(scope="class")
    def bundle(self):
        return random_bundle(jax.random.PRNGKey(0), tiny=True,
                             controlnet_names=("sam", "inpaint", "tile"))

    def _tiled_pipe(self, bundle):
        pipe = EditPipeline(bundle)
        pipe.vae_oneshot_max_px = 32     # 64px image -> tiled path
        pipe.vae_tile_latent = 4         # latents 8x8 -> 4 tiles of 4^2
        pipe.vae_tile_overlap = 2
        return pipe

    def test_edit_through_tiled_vae(self, bundle):
        pipe = self._tiled_pipe(bundle)
        assert pipe._decode_tile_spec(64, 64) == (4, 2)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        out = pipe(image=img, mask=mask, prompt="a cat",
                   condition_image=img, image_resolution=64, num_steps=2,
                   num_samples=1, seed=0)
        assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8

    def test_tiled_matches_oneshot_outside_mask_structure(self, bundle):
        """Same edit with and without tiling: latent-blend inpainting keeps
        the unmasked region, so both paths must agree closely there (only
        the VAE decode differs)."""
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[24:40, 24:40] = 255
        kw = dict(image=img, mask=mask, prompt="x", condition_image=img,
                  image_resolution=64, num_steps=2, num_samples=1, seed=3)
        ref = EditPipeline(bundle)(**kw).astype(np.int32)
        out = self._tiled_pipe(bundle)(**kw).astype(np.int32)
        border = np.abs(out[0, :8] - ref[0, :8]).mean()
        assert border < 40  # loose: tiled GN stats differ, structure must not

    def test_program_cache_keys_tiled_separately(self, bundle):
        cache = ProgramCache()
        from editanything_tpu.engine import DenoiseConfig
        dcfg = DenoiseConfig(unet=bundle.unet_cfg,
                             controlnets=bundle.controlnet_cfgs(("sam",)),
                             num_steps=2)
        a = cache.get(bundle, dcfg, 2, with_scale_maps=False)
        b = cache.get(bundle, dcfg, 2, with_scale_maps=False,
                      decode_tile=(4, 2))
        c = cache.get(bundle, dcfg, 2, with_scale_maps=False)
        assert a is not b and a is c
