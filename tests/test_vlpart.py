"""VLPart detection stack tests (tiny config) + detection ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.models import detection as D
from editanything_tpu.models import vlpart as VP
from editanything_tpu.text.tokenizer import tiny_tokenizer


class TestDetectionOps:
    def test_level_anchors(self):
        a = D.level_anchors(2, 3, 4, 32.0)
        assert a.shape == (2 * 3 * 3, 4)
        # ratio-1 anchor at cell (0,0): center (2, 2), size 32
        sq = a[1]
        assert np.allclose(sq, [2 - 16, 2 - 16, 2 + 16, 2 + 16])

    def test_apply_deltas_identity(self):
        boxes = jnp.asarray([[10.0, 10.0, 30.0, 50.0]])
        out = D.apply_deltas(jnp.zeros((1, 4)), boxes)
        np.testing.assert_allclose(np.asarray(out), np.asarray(boxes),
                                   atol=1e-5)

    def test_apply_deltas_shift_scale(self):
        boxes = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
        deltas = jnp.asarray([[0.5, 0.0, float(np.log(2.0)), 0.0]])
        out = np.asarray(D.apply_deltas(deltas, boxes))[0]
        # ctr moves +10 in x, width doubles to 40
        assert np.isclose(out[2] - out[0], 40, atol=1e-4)
        assert np.isclose((out[0] + out[2]) / 2, 20, atol=1e-4)

    def test_roi_align_constant_field(self):
        feat = jnp.ones((16, 16, 3)) * 5.0
        boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
        out = D.roi_align(feat, boxes, out_size=4)
        np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)

    def test_roi_align_gradient_field(self):
        """Pooling a linear-in-x feature must give increasing columns."""
        xs = jnp.arange(32, dtype=jnp.float32)
        feat = jnp.broadcast_to(xs[None, :, None], (32, 32, 1))
        boxes = jnp.asarray([[4.0, 4.0, 28.0, 28.0]])
        out = np.asarray(D.roi_align(feat, boxes, out_size=4))[0, 0, :, 0]
        assert (np.diff(out) > 0).all()

    def test_level_assignment(self):
        boxes = jnp.asarray([
            [0, 0, 32, 32],        # small -> p2
            [0, 0, 448, 448],      # canonical*2 -> p5
        ], jnp.float32)
        lvl = np.asarray(D.assign_fpn_level(boxes))
        assert lvl[0] == 2 and lvl[1] == 5


class TestVLPart:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = VP.tiny_vlpart_config()
        params = VP.init_vlpart(jax.random.PRNGKey(0), cfg)
        tok = tiny_tokenizer(words=("dog", "head", "cat", "background", "a"),
                             context_length=16)
        return cfg, params, tok

    def test_vocabulary_embeddings(self, setup):
        cfg, params, tok = setup
        emb = VP.encode_vocabulary(params, cfg, tok, "dog head.cat head")
        assert emb.shape == (cfg.zs_weight_dim, 3)   # 2 classes + background
        norms = np.linalg.norm(np.asarray(emb), axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_detect_shapes_and_validity(self, setup):
        cfg, params, tok = setup
        px = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        emb = VP.encode_vocabulary(params, cfg, tok, "dog head")
        out = jax.jit(lambda p, x, t: VP.detect(p, cfg, x, t))(
            params, px, emb)
        t = cfg.test_topk
        assert out["boxes"].shape == (t, 4)
        assert out["scores"].shape == (t,)
        assert out["valid"].dtype == bool
        b = np.asarray(out["boxes"])
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
        assert b.max() <= 64.0 + 1e-3

    def test_detector_wrapper(self, setup):
        cfg, params, tok = setup
        det = VP.VLPartDetector(params, cfg, tok, short_side=64,
                                max_side=96)
        img = np.random.RandomState(0).randint(
            0, 255, (80, 100, 3)).astype(np.uint8)
        boxes, scores, labels = det(img, "dog head")
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        assert len(scores) == len(labels) == boxes.shape[0]
        # boxes rescaled back to the original frame
        if len(boxes):
            assert boxes.max() <= max(80, 100) * 1.35
