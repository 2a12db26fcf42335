"""Swin backbone + FPN tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.models import swin as SW

TINY = SW.SwinConfig(embed_dim=16, depths=(1, 2), num_heads=(2, 4),
                     window_size=4, out_indices=(0, 1))


@pytest.fixture(scope="module")
def params():
    return SW.init_swin(jax.random.PRNGKey(0), TINY)


class TestSwin:
    def test_window_partition_roundtrip(self):
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        wins = SW._window_partition(x, 4)
        assert wins.shape == (2 * 4, 16, 3)
        back = SW._window_merge(wins, 4, 2, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_rel_pos_index_bounds(self):
        idx = SW._rel_pos_index(7)
        assert idx.shape == (49, 49)
        assert idx.min() >= 0 and idx.max() < 13 * 13
        assert (np.diag(idx) == idx[0, 0]).all()   # same offset on diagonal

    def test_shift_mask_blocks(self):
        m = SW._shift_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        assert m[0].all()                 # interior window fully connected
        assert not m[-1].all()            # corner window partitioned

    def test_backbone_shapes(self, params):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        outs = SW.apply(params, TINY, x)
        assert outs["swin0"].shape == (1, 8, 8, 16)
        assert outs["swin1"].shape == (1, 4, 4, 32)

    def test_non_divisible_input_padded(self, params):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 30, 34, 3))
        outs = SW.apply(params, TINY, x)
        # patch 4: 30->32/4=8, 34->36/4=9
        assert outs["swin0"].shape == (1, 8, 9, 16)

    def test_jits(self, params):
        f = jax.jit(lambda p, x: SW.apply(p, TINY, x)["swin1"])
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
        out = f(params, x)
        assert np.isfinite(np.asarray(out)).all()


class TestFPN:
    def test_fpn_levels(self):
        key = jax.random.PRNGKey(0)
        fpn = SW.init_fpn(key, (16, 32, 64, 128), out_channels=8)
        feats = [jax.random.normal(key, (1, 32 // s, 32 // s, d))
                 for s, d in zip((1, 2, 4, 8), (16, 32, 64, 128))]
        outs = SW.fpn_apply(fpn, feats)
        assert set(outs) == {"p2", "p3", "p4", "p5", "p6"}
        assert outs["p2"].shape == (1, 32, 32, 8)
        assert outs["p6"].shape == (1, 2, 2, 8)

    def test_top_down_flow(self):
        """Zeroing the coarsest input must change every output level."""
        key = jax.random.PRNGKey(1)
        fpn = SW.init_fpn(key, (8, 16), out_channels=8)
        f0 = jax.random.normal(key, (1, 8, 8, 8))
        f1 = jax.random.normal(key, (1, 4, 4, 16))
        a = SW.fpn_apply(fpn, [f0, f1], extra_maxpool=False)
        b = SW.fpn_apply(fpn, [f0, jnp.zeros_like(f1)], extra_maxpool=False)
        assert (np.asarray(a["p2"]) != np.asarray(b["p2"])).any()
