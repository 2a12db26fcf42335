"""Model structure & behavior tests (tiny configs for CPU speed).

Parity targets from SURVEY.md section 2.3/2.4: residual counts (13 ControlNet
outputs, cldm/cldm.py:284-305), zero-conv init => ControlNet is a no-op at
initialization (tool_add_control semantics), SD1.5 parameter counts, causal
CLIP masking, VAE posterior behavior.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.models import config as C
from editanything_tpu.models import unet as U
from editanything_tpu.models import controlnet as CN
from editanything_tpu.models import vae as V
from editanything_tpu.models import clip_text as CT


TINY_UNET = C.UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=2,
    cross_attention_dim=64,
    attention_head_dim=(2, 2),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    norm_num_groups=8,
)
TINY_VAE = C.VAEConfig(block_out_channels=(16, 32), latent_channels=4,
                       norm_num_groups=8)
TINY_CLIP = C.CLIPTextConfig(vocab_size=100, hidden_size=32,
                             intermediate_size=64, num_layers=2, num_heads=4,
                             max_position_embeddings=16)


@pytest.fixture(scope="module")
def tiny_unet_params():
    return U.init_unet(jax.random.PRNGKey(0), TINY_UNET)


def test_unet_forward_shapes(tiny_unet_params):
    x = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, 64))
    out = U.apply(tiny_unet_params, TINY_UNET, x, jnp.array([1, 500]), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_jit_compiles_once(tiny_unet_params):
    calls = 0

    def f(p, x, t, ctx):
        nonlocal calls
        calls += 1
        return U.apply(p, TINY_UNET, x, t, ctx)

    jf = jax.jit(f)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 64))
    jf(tiny_unet_params, x, jnp.array([1]), ctx)
    jf(tiny_unet_params, x, jnp.array([999]), ctx)
    assert calls == 1   # timestep is data, not structure: no retrace


def test_unet_residual_count(tiny_unet_params):
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 64))
    temb = U.time_embed(tiny_unet_params, TINY_UNET, jnp.array([3]), x.dtype)
    _, res = U.encode(tiny_unet_params, TINY_UNET, x, temb, ctx)
    # 1 (conv_in) + layers_per_block per block + downsample per non-final
    assert len(res) == 1 + 2 + 1 + 2


def test_controlnet_zero_init_is_identity(tiny_unet_params):
    """Freshly initialized ControlNet must leave the UNet output unchanged
    (zero convs; the grafting invariant of tools/tool_add_control_sd21.py)."""
    cn_cfg = C.ControlNetConfig(unet=TINY_UNET)
    cn = CN.init_controlnet(jax.random.PRNGKey(1), cn_cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 64))
    cond = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    t = jnp.array([42])
    down, mid = CN.apply(cn, cn_cfg, x, t, ctx, cond)
    assert len(down) == 6
    for r in down:
        np.testing.assert_array_equal(np.asarray(r), 0.0)
    np.testing.assert_array_equal(np.asarray(mid), 0.0)

    base = U.apply(tiny_unet_params, TINY_UNET, x, t, ctx)
    with_cn = U.apply(tiny_unet_params, TINY_UNET, x, t, ctx,
                      down_block_residuals=down, mid_block_residual=mid)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_cn),
                               atol=1e-6)


def test_controlnet_residual_shapes_and_scale_map():
    cn_cfg = C.ControlNetConfig(unet=TINY_UNET)
    cn = CN.init_controlnet(jax.random.PRNGKey(1), cn_cfg)
    # make zero convs non-zero so scaling is observable
    cn = jax.tree.map(
        lambda a: a + 0.1 if a.ndim == 4 else a, cn)
    x = jnp.ones((2, 8, 8, 4))
    ctx = jnp.ones((2, 7, 64))
    cond = jnp.ones((2, 64, 64, 3))
    t = jnp.array([7, 7])
    down1, mid1 = CN.apply(cn, cn_cfg, x, t, ctx, cond, conditioning_scale=1.0)
    down2, mid2 = CN.apply(cn, cn_cfg, x, t, ctx, cond, conditioning_scale=0.5)
    np.testing.assert_allclose(np.asarray(mid2), np.asarray(mid1) * 0.5,
                               rtol=1e-5)
    # spatial scale map: zero map must null all residuals
    smap = jnp.zeros((2, 64, 64))
    down3, mid3 = CN.apply(cn, cn_cfg, x, t, ctx, cond,
                           conditioning_scale=1.0,
                           conditioning_scale_map=smap)
    np.testing.assert_array_equal(np.asarray(mid3), 0.0)
    for r in down3:
        np.testing.assert_array_equal(np.asarray(r), 0.0)
    # per-residual spatial sizes follow the encoder: 16,16,16, 8,8,8
    sizes = [r.shape[1] for r in down1]
    assert sizes == [8, 8, 8, 4, 4, 4]


def test_multi_controlnet_sums():
    cn_cfg = C.ControlNetConfig(unet=TINY_UNET)
    cn = CN.init_controlnet(jax.random.PRNGKey(1), cn_cfg)
    cn = jax.tree.map(lambda a: a + 0.05 if a.ndim == 4 else a, cn)
    x = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 7, 64))
    cond = jnp.ones((1, 64, 64, 3))
    t = jnp.array([7])
    d1, m1 = CN.apply(cn, cn_cfg, x, t, ctx, cond)
    d2, m2 = CN.multi_controlnet_apply(
        [cn, cn], [cn_cfg, cn_cfg], x, t, ctx, [cond, cond], [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1) * 2, rtol=1e-5)


def test_vae_roundtrip_shapes():
    p = V.init_vae(jax.random.PRNGKey(0), TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3)) * 0.5
    post = V.encode(p, TINY_VAE, x)
    assert post.mean.shape == (1, 8, 8, 4)
    assert float(post.kl()[0]) >= 0.0
    z = V.encode_to_latents(p, TINY_VAE, x)
    img = V.decode_from_latents(p, TINY_VAE, z)
    assert img.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_vae_sample_uses_key():
    p = V.init_vae(jax.random.PRNGKey(0), TINY_VAE)
    x = jnp.zeros((1, 16, 16, 3))
    post = V.encode(p, TINY_VAE, x)
    s1 = post.sample(jax.random.PRNGKey(1))
    s2 = post.sample(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_clip_causal_masking():
    """Hidden state at position i must not depend on tokens after i."""
    p = CT.init_clip_text(jax.random.PRNGKey(0), TINY_CLIP)
    ids1 = jnp.array([[1, 2, 3, 4, 5]])
    ids2 = jnp.array([[1, 2, 3, 9, 9]])
    h1 = CT.apply(p, TINY_CLIP, ids1)
    h2 = CT.apply(p, TINY_CLIP, ids2)
    np.testing.assert_allclose(np.asarray(h1[:, :3]), np.asarray(h2[:, :3]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(h1[:, 3:]), np.asarray(h2[:, 3:]))


def test_clip_layer_skip():
    p = CT.init_clip_text(jax.random.PRNGKey(0), TINY_CLIP)
    ids = jnp.array([[1, 2, 3]])
    full = CT.apply(p, TINY_CLIP, ids, layer_skip=0)
    pen = CT.apply(p, TINY_CLIP, ids, layer_skip=1)
    assert not np.allclose(np.asarray(full), np.asarray(pen))


def _count_shapes(init_fn, cfg):
    # eval_shape: count parameters without materializing 859M floats on CPU
    import functools
    tree = jax.eval_shape(functools.partial(init_fn, cfg=cfg),
                          jax.random.PRNGKey(0))
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(tree))


def test_sd15_unet_param_count():
    """Structural parity with the real SD1.5 UNet (859.52M params)."""
    n = _count_shapes(U.init_unet, C.sd15_unet())
    assert abs(n - 859_520_964) < 1_000_000, n


def test_sd21_unet_param_count():
    """SD2.x UNet (865.91M params: 1024-dim context, linear projections)."""
    n = _count_shapes(U.init_unet, C.sd21_unet())
    assert abs(n - 865_910_724) < 2_000_000, n


def test_sd15_vae_param_count():
    """AutoencoderKL (SD) has 83.65M params."""
    n = _count_shapes(V.init_vae, C.VAEConfig())
    assert abs(n - 83_653_863) < 500_000, n


def test_clip_vitl_param_count():
    """CLIP ViT-L text tower (SD1.5 text_encoder) has 123.06M params."""
    n = _count_shapes(CT.init_clip_text, C.clip_vit_l())
    assert abs(n - 123_060_480) < 1_000_000, n


def test_controlnet_param_count():
    """diffusers ControlNetModel (SD1.5 base) has 361.28M params."""
    n = _count_shapes(CN.init_controlnet, C.ControlNetConfig(unet=C.sd15_unet()))
    assert abs(n - 361_279_120) < 2_000_000, n
