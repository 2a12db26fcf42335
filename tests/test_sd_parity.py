"""Golden forward parity for the diffusion core vs torch replicas.

Closes VERDICT round-1 item 2: UNet / ControlNet / VAE — the
image-quality-bearing math — validated against hand-built torch modules
(tests/sd_replica.py) that replicate the reference architecture
(/root/reference/ldm + cldm + utils/stable_diffusion_controlnet.py) in the
diffusers key layout our converters consume. fp32, tolerance ~1e-5."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from editanything_tpu.checkpoints.convert import diffusers_to_tree  # noqa: E402
from editanything_tpu.models import blocks as B  # noqa: E402
from editanything_tpu.models import config as C  # noqa: E402
from editanything_tpu.models import controlnet as CN  # noqa: E402
from editanything_tpu.models import unet as U  # noqa: E402
from editanything_tpu.models import vae as V  # noqa: E402

import sd_replica as R  # noqa: E402
from test_convert import tree_paths  # noqa: E402

TINY_UNET = C.UNetConfig(
    block_out_channels=(32, 64), layers_per_block=2,
    cross_attention_dim=48, attention_head_dim=(2, 2),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    norm_num_groups=8)


def _randomize(m, scale=0.1, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn_like(p) * scale)
    return m.eval()


def _to_tree(m):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return diffusers_to_tree(sd)


def _make_unet_replica():
    return _randomize(R.UNetReplica(
        block_out_channels=(32, 64), layers_per_block=2, context_dim=48,
        heads=(2, 2), groups=8))


class TestBlockParity:
    def test_resnet_block(self):
        blk = _randomize(R.ResnetBlock2D(8, 16, temb_ch=12, groups=4),
                         seed=1)
        params = _to_tree(blk)
        rng = np.random.RandomState(0)
        x = rng.randn(2, 8, 6, 10).astype(np.float32)   # NCHW
        temb = rng.randn(2, 12).astype(np.float32)
        with torch.no_grad():
            ref = blk(torch.tensor(x), torch.tensor(temb)).numpy()
        ours = B.resnet_block(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              jnp.asarray(temb), num_groups=4)
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("use_linear", [False, True])
    def test_spatial_transformer(self, use_linear):
        blk = _randomize(R.Transformer2DModel(16, 24, heads=2,
                                              use_linear=use_linear,
                                              groups=4), seed=2)
        params = _to_tree(blk)
        rng = np.random.RandomState(1)
        x = rng.randn(2, 16, 4, 6).astype(np.float32)
        ctx = rng.randn(2, 5, 24).astype(np.float32)
        with torch.no_grad():
            ref = blk(torch.tensor(x), torch.tensor(ctx)).numpy()
        ours = B.spatial_transformer(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ctx),
            heads=2, use_linear=use_linear, num_groups=4)
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-5, atol=1e-5)

    def test_up_down_sample(self):
        down = _randomize(R.Downsample2D(8), seed=3)
        up = _randomize(R.Upsample2D(8), seed=4)
        rng = np.random.RandomState(2)
        x = rng.randn(1, 8, 6, 6).astype(np.float32)
        with torch.no_grad():
            rd = down(torch.tensor(x)).numpy()
            ru = up(torch.tensor(x)).numpy()
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        od = B.downsample(_to_tree(down), xj)
        ou = B.upsample(_to_tree(up), xj)
        np.testing.assert_allclose(np.asarray(od).transpose(0, 3, 1, 2),
                                   rd, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ou).transpose(0, 3, 1, 2),
                                   ru, rtol=1e-5, atol=1e-6)


class TestUNetParity:
    def test_full_forward_with_residual_injection(self):
        m = _make_unet_replica()
        params = _to_tree(m)
        # structure: converter output == init tree
        ours_init = U.init_unet(jax.random.PRNGKey(0), TINY_UNET)
        assert tree_paths(params) == tree_paths(ours_init)

        rng = np.random.RandomState(3)
        x = rng.randn(2, 4, 8, 8).astype(np.float32)
        ctx = rng.randn(2, 6, 48).astype(np.float32)
        t = np.array([7, 321], np.int64)
        # ControlNet-style residuals: 7 down (1 + 2 + 1 + 2 ... per config)
        temb = U.time_embed(params, TINY_UNET, jnp.asarray(t), jnp.float32)
        _, res_ref = U.encode(params, TINY_UNET,
                              jnp.asarray(x.transpose(0, 2, 3, 1)), temb,
                              jnp.asarray(ctx))
        down_res = [rng.randn(*np.asarray(r).shape).astype(np.float32) * 0.1
                    for r in res_ref]
        mid_res = rng.randn(2, 4, 4, 64).astype(np.float32) * 0.1

        with torch.no_grad():
            ref = m(torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
                    down_block_residuals=[
                        torch.tensor(r.transpose(0, 3, 1, 2))
                        for r in down_res],
                    mid_block_residual=torch.tensor(
                        mid_res.transpose(0, 3, 1, 2))).numpy()
        ours = U.apply(params, TINY_UNET,
                       jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(t), jnp.asarray(ctx),
                       down_block_residuals=tuple(jnp.asarray(r)
                                                  for r in down_res),
                       mid_block_residual=jnp.asarray(mid_res))
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-4, atol=1e-5)


class TestControlNetParity:
    @pytest.fixture(scope="class")
    def pair(self):
        unet = _make_unet_replica()
        m = R.ControlNetReplica(unet, cond_chans=(4, 8),
                                block_out_channels=(32, 64),
                                layers_per_block=2)
        _randomize(m, seed=5)
        sd = m.state_dict_standalone()
        params = diffusers_to_tree(
            {k: v.detach().numpy() for k, v in sd.items()})
        cfg = C.ControlNetConfig(unet=TINY_UNET,
                                 conditioning_embedding_channels=(4, 8))
        return m, params, cfg

    def test_structure(self, pair):
        _, params, cfg = pair
        ours = CN.init_controlnet(jax.random.PRNGKey(0), cfg)
        assert tree_paths(params) == tree_paths(ours)

    @pytest.mark.parametrize("mode", ["scalar", "map", "guess"])
    def test_forward(self, pair, mode):
        m, params, cfg = pair
        rng = np.random.RandomState(4)
        x = rng.randn(1, 4, 8, 8).astype(np.float32)
        ctx = rng.randn(1, 6, 48).astype(np.float32)
        # tiny hint stack has one stride-2 conv -> cond at 2x latent res
        cond = rng.rand(1, 3, 16, 16).astype(np.float32)
        t = np.array([50], np.int64)
        scale = 0.7 if mode != "map" else 1.0
        smap = (rng.rand(24, 24).astype(np.float32)
                if mode == "map" else None)
        with torch.no_grad():
            rd, rm = m(torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
                       torch.tensor(cond), conditioning_scale=scale,
                       scale_map=(torch.tensor(smap) if smap is not None
                                  else None),
                       guess_mode=mode == "guess")
        od, om = CN.apply(params, cfg,
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(t), jnp.asarray(ctx),
                          jnp.asarray(cond.transpose(0, 2, 3, 1)),
                          conditioning_scale=scale,
                          conditioning_scale_map=(
                              jnp.asarray(smap)[None]
                              if smap is not None else None),
                          guess_mode=mode == "guess")
        assert len(od) == len(rd)
        for o, r in zip(od, rd):
            np.testing.assert_allclose(
                np.asarray(o).transpose(0, 3, 1, 2), r.numpy(),
                rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(om).transpose(0, 3, 1, 2),
                                   rm.numpy(), rtol=1e-4, atol=1e-5)


class TestVAEParity:
    @pytest.fixture(scope="class")
    def pair(self):
        m = _randomize(R.VAEReplica(chans=(16, 32), layers=2, z=4,
                                    groups=8), seed=6)
        params = _to_tree(m)
        cfg = C.VAEConfig(block_out_channels=(16, 32), latent_channels=4,
                          norm_num_groups=8)
        return m, params, cfg

    def test_structure(self, pair):
        _, params, cfg = pair
        ours = V.init_vae(jax.random.PRNGKey(0), cfg)
        assert tree_paths(params) == tree_paths(ours)

    def test_encode_moments(self, pair):
        m, params, cfg = pair
        rng = np.random.RandomState(5)
        x = rng.randn(1, 3, 16, 16).astype(np.float32)
        with torch.no_grad():
            ref = m.encode_moments(torch.tensor(x)).numpy()
        post = V.encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
        ours = np.concatenate([np.asarray(post.mean),
                               np.asarray(post.logvar)], axis=-1)
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_decode(self, pair):
        m, params, cfg = pair
        rng = np.random.RandomState(6)
        z = rng.randn(1, 4, 4, 4).astype(np.float32)
        with torch.no_grad():
            ref = m.decode(torch.tensor(z)).numpy()
        ours = V.decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-4, atol=1e-5)
