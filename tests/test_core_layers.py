"""Unit tests for core layers vs torch (CPU) golden behavior.

The reference's numerics to match: GroupNorm+SiLU stacks
(ldm/modules/diffusionmodules/model.py:41-48) and softmax attention
(ldm/modules/attention.py:163-194). torch (CPU build) provides the goldens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from editanything_tpu.core import layers
from editanything_tpu.core import kernels
from editanything_tpu.core import flash_attention


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 64), dtype=np.float32)
    scale = rng.standard_normal(64, dtype=np.float32)
    bias = rng.standard_normal(64, dtype=np.float32)

    got = layers.group_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                            jnp.array(x), num_groups=32)

    gn = torch.nn.GroupNorm(32, 64)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        # torch GroupNorm is NCHW
        want = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_fused_group_norm_silu_matches_unfused():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.standard_normal((2, 16, 16, 64), dtype=np.float32))
    params = {"scale": jnp.array(rng.standard_normal(64, dtype=np.float32)),
              "bias": jnp.array(rng.standard_normal(64, dtype=np.float32))}
    fused = kernels.group_norm_silu(params, x, num_groups=32)
    ref = jax.nn.silu(layers.group_norm(params, x, num_groups=32))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 7, 96), dtype=np.float32)
    scale = rng.standard_normal(96, dtype=np.float32)
    bias = rng.standard_normal(96, dtype=np.float32)
    got = layers.layer_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                            jnp.array(x))
    ln = torch.nn.LayerNorm(96)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
        want = ln(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 10, 10, 8), dtype=np.float32)
    k = rng.standard_normal((3, 3, 8, 16), dtype=np.float32) * 0.1
    b = rng.standard_normal(16, dtype=np.float32)
    got = layers.conv2d({"kernel": jnp.array(k), "bias": jnp.array(b)},
                        jnp.array(x), stride=2, padding=1)
    conv = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k).permute(3, 2, 0, 1))
        conv.bias.copy_(torch.from_numpy(b))
        want = conv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_conv2d_9shift_matches_native():
    """The 9-shifted-matmul lowering (EA_CONV9) is the same contraction as
    lax.conv — same values up to fp32 accumulation order."""
    rng = np.random.default_rng(31)
    x = jnp.array(rng.standard_normal((2, 12, 12, 24), dtype=np.float32))
    k = jnp.array(rng.standard_normal((3, 3, 24, 16), dtype=np.float32) * 0.1)
    b = jnp.array(rng.standard_normal(16, dtype=np.float32))
    got = layers._conv2d_9shift(k, x) + b
    want = layers.conv2d({"kernel": k, "bias": b}, x, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cin,cout,temb", [(64, 32, True), (32, 32, False)])
def test_resnet_fused_kernel_matches_reference(cin, cout, temb):
    """The fused resnet Pallas kernel (interpret mode here; dispatched on
    real TPU only) reproduces the composed GN+SiLU+conv+temb+skip ops."""
    from editanything_tpu.models import blocks as B
    rng = np.random.default_rng(32)
    key = jax.random.PRNGKey(7)
    params = B.init_resnet_block(key, cin, cout, 48 if temb else None)
    x = jnp.array(rng.standard_normal((2, 16, 16, cin), dtype=np.float32))
    trow = jnp.array(rng.standard_normal((2, cout), dtype=np.float32)) \
        if temb else None
    got = kernels._resnet_diff(params, x,
                               trow if trow is not None
                               else jnp.zeros((2, cout), x.dtype),
                               32, 1e-5)
    want = kernels._resnet_reference(params, x, trow, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_attention_reference_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((2, 4, 33, 40), dtype=np.float32)
    k = rng.standard_normal((2, 4, 77, 40), dtype=np.float32)
    v = rng.standard_normal((2, 4, 77, 40), dtype=np.float32)
    got = layers.attention_reference(jnp.array(q), jnp.array(k), jnp.array(v))
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


@pytest.mark.parametrize("n,m,d", [(128, 128, 40), (256, 300, 64), (130, 77, 160)])
def test_flash_attention_matches_reference(n, m, d):
    rng = np.random.default_rng(5)
    q = jnp.array(rng.standard_normal((1, 2, n, d), dtype=np.float32))
    k = jnp.array(rng.standard_normal((1, 2, m, d), dtype=np.float32))
    v = jnp.array(rng.standard_normal((1, 2, m, d), dtype=np.float32))
    got = flash_attention.flash_attention(q, k, v)
    want = layers.attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding(t, dim, flip_sin_to_cos=True,
    # downscale_freq_shift=0) golden, computed with torch here.
    t = np.array([0, 1, 500, 999], dtype=np.float32)
    dim = 320
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    emb = t[:, None] * np.exp(exponent)[None, :]
    want = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    got = layers.timestep_embedding(jnp.array(t), dim)
    # fp32 sin/cos argument reduction differs between XLA and numpy for large
    # t*freq; 5e-3 is far below bf16 resolution downstream.
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


def test_geglu():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 5, 8), dtype=np.float32)
    kern = rng.standard_normal((8, 32), dtype=np.float32)
    bias = rng.standard_normal(32, dtype=np.float32)
    got = layers.geglu({"kernel": jnp.array(kern), "bias": jnp.array(bias)},
                       jnp.array(x))
    h = torch.from_numpy(x) @ torch.from_numpy(kern) + torch.from_numpy(bias)
    a, g = h.chunk(2, dim=-1)
    want = a * torch.nn.functional.gelu(g)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TestKernelGradients:
    """Pallas-forward kernels must be differentiable with reference-exact
    gradients (custom_vjp recomputes through the XLA implementations)."""

    def test_group_norm_silu_grad_matches_reference(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from editanything_tpu.core import kernels as K
        from editanything_tpu.core import layers as L

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 8, 32))
        p = {"scale": jnp.ones((32,)) * 1.3, "bias": jnp.ones((32,)) * 0.1}

        def f_kernel(p, x):
            return jnp.sum(K.group_norm_silu(p, x, num_groups=8) ** 2)

        def f_ref(p, x):
            return jnp.sum(jax.nn.silu(
                L.group_norm(p, x, num_groups=8)) ** 2)

        gk = jax.grad(f_kernel, argnums=(0, 1))(p, x)
        gr = jax.grad(f_ref, argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    def test_flash_attention_grad_matches_reference(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from editanything_tpu.core import flash_attention as FA
        from editanything_tpu.core import layers as L

        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (1, 2, 256, 64))
        k = jax.random.normal(ks[1], (1, 2, 256, 64))
        v = jax.random.normal(ks[2], (1, 2, 256, 64))

        gk = jax.grad(lambda q, k, v: jnp.sum(
            FA.dispatch(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(
            L.attention_reference(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)


def test_sam_upscale_hyper_kernel_matches_xla():
    """Fused mask-decoder upscale+hypernetwork kernel (interpret mode on
    CPU) vs the conv_transpose XLA fallback — exact same math."""
    from editanything_tpu.core import kernels as K
    rng = np.random.default_rng(0)
    b, npix, c, nm = 2, 4096, 256, 4
    src = jnp.asarray(rng.normal(0, 1, (b, npix, c)).astype(np.float32))
    hyper = jnp.asarray(rng.normal(0, 1, (b, nm, 32)).astype(np.float32))
    up = {
        "0": {"kernel": jnp.asarray(
                  rng.normal(0, .1, (2, 2, 256, 64)).astype(np.float32)),
              "bias": jnp.asarray(
                  rng.normal(0, .1, (64,)).astype(np.float32))},
        "1": {"weight": jnp.asarray(
                  rng.normal(1, .1, (64,)).astype(np.float32)),
              "bias": jnp.asarray(
                  rng.normal(0, .1, (64,)).astype(np.float32))},
        "3": {"kernel": jnp.asarray(
                  rng.normal(0, .1, (2, 2, 64, 32)).astype(np.float32)),
              "bias": jnp.asarray(
                  rng.normal(0, .1, (32,)).astype(np.float32))},
    }
    got = K.sam_upscale_hyper(src, up, hyper)
    assert got.shape == (b, nm, 256, 256)
    old = K._DISABLED
    try:
        K._DISABLED = True
        want = K.sam_upscale_hyper(src, up, hyper)
    finally:
        K._DISABLED = old
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4 * scale, rtol=1e-4)
