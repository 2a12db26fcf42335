"""Tiled ControlNet hint embedding == one-shot (bit-exact tiling).

The 4096^2+ refine buckets route the hint conv stack through
models.controlnet._hint_embedding_tiled (the one-shot stack's 16-channel
activations lane-pad 8x on TPU: two ~8 GB buffers at 4096^2). Tiling a
conv stack is only acceptable if it is EXACT — these tests pin the tiled
stack against the one-shot stack at shapes that exercise interior tiles,
clamped overlapping tiles, and true image borders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.core import layers as L
from editanything_tpu.models import controlnet as CN


def _emb_params(key, chans=(4, 4, 8, 8), cout=16):
    """Minimal controlnet_cond_embedding tree (structure of
    init_controlnet's, non-zero conv_out so parity is non-trivial)."""
    ks = iter(jax.random.split(key, 16))
    emb = {"conv_in": L.init_conv2d(next(ks), 3, chans[0], 3)}
    blocks = {}
    for i in range(len(chans) - 1):
        blocks[str(2 * i)] = L.init_conv2d(next(ks), chans[i], chans[i], 3)
        blocks[str(2 * i + 1)] = L.init_conv2d(next(ks), chans[i],
                                               chans[i + 1], 3)
    emb["blocks"] = blocks
    emb["conv_out"] = L.init_conv2d(next(ks), chans[-1], cout, 3)
    return {"controlnet_cond_embedding": emb}


@pytest.mark.parametrize("shape", [(1, 192, 128), (2, 160, 160),
                                   (1, 64, 192)])
def test_tiled_matches_oneshot(shape):
    b, h, w = shape
    params = _emb_params(jax.random.PRNGKey(0))
    cond = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))
    ref = CN._hint_embedding_oneshot(params, cond)
    out = CN._hint_embedding_tiled(params, cond, tile=64, halo=32)
    assert out.shape == ref.shape == (b, h // 8, w // 8, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tiled_clamped_overlap_exact():
    """160 with tile 64 -> starts [0, 64, 96]: the clamped last tile
    overwrites half of the middle tile — values must agree exactly."""
    params = _emb_params(jax.random.PRNGKey(2))
    cond = jax.random.uniform(jax.random.PRNGKey(3), (1, 160, 64, 3))
    ref = CN._hint_embedding_oneshot(params, cond)
    out = CN._hint_embedding_tiled(params, cond, tile=64, halo=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_threshold(monkeypatch):
    """_hint_embedding routes above _HINT_ONESHOT_MAX through the tiled
    stack (checked by result identity, not internals)."""
    params = _emb_params(jax.random.PRNGKey(4))
    cond = jax.random.uniform(jax.random.PRNGKey(5), (1, 128, 128, 3))
    ref = CN._hint_embedding_oneshot(params, cond)
    monkeypatch.setattr(CN, "_HINT_ONESHOT_MAX", 96)
    out = CN._hint_embedding(params, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
