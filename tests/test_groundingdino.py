"""GroundingDINO tests (tiny config): BERT, deformable attention, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.models import groundingdino as GD
from editanything_tpu.text.tokenizer import tiny_bert_tokenizer


class TestBertTokenizer:
    def test_wordpiece_splits(self):
        tok = tiny_bert_tokenizer()
        assert tok.tokenize("a dog head") == ["a", "dog", "head"]
        pieces = tok.tokenize("dogs")          # unknown word -> pieces
        assert pieces[0] == "dog" or pieces == ["[UNK]"] or len(pieces) > 1

    def test_encode_padded(self):
        tok = tiny_bert_tokenizer()
        ids, mask, tokens = tok.encode_padded("a dog.", 12)
        assert ids.shape == (12,) and mask.shape == (12,)
        assert tokens[0] == "[CLS]" and tokens[-1] == "[SEP]"
        assert mask.sum() == len(tokens)


class TestDeformAttn:
    def test_bilinear_sample_exact(self):
        v = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
        # center of pixel (1, 2) in normalized coords
        locs = jnp.asarray([[(2 + 0.5) / 4, (1 + 0.5) / 4]])
        out = GD._bilinear_sample(v, locs)
        assert np.isclose(float(out[0, 0]), 6.0)

    def test_deform_attn_shapes(self):
        d, heads, points = 16, 2, 2
        shapes = [(4, 4), (2, 2)]
        p = GD.init_deform_attn(jax.random.PRNGKey(0), d, heads,
                                len(shapes), points, jnp.float32)
        q = jax.random.normal(jax.random.PRNGKey(1), (5, d))
        refs = jnp.broadcast_to(
            jax.random.uniform(jax.random.PRNGKey(2), (5, 1, 2)),
            (5, 2, 2))
        val = jax.random.normal(jax.random.PRNGKey(3), (16 + 4, d))
        out = GD.deform_attn(p, q, refs, val, shapes, heads=heads,
                             points=points)
        assert out.shape == (5, d)
        assert np.isfinite(np.asarray(out)).all()


class TestDINO:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = GD.tiny_dino_config()
        params = GD.init_dino(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def test_bert_masked(self, setup):
        cfg, params = setup
        ids = jnp.asarray([[2, 5, 6, 3, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], bool)
        out = GD.bert_apply(params["bert"], cfg.bert, ids, mask)
        assert out.shape == (1, 6, cfg.bert.hidden)

    def test_forward_shapes(self, setup):
        cfg, params = setup
        px = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        tok = tiny_bert_tokenizer()
        ids, mask, _ = tok.encode_padded("a dog.", cfg.max_text_len)
        out = jax.jit(lambda p, x, i, m: GD.dino_forward(p, cfg, x, i, m))(
            params, px, jnp.asarray(ids)[None], jnp.asarray(mask)[None])
        assert out["logits"].shape == (cfg.num_queries, cfg.max_text_len)
        b = np.asarray(out["boxes"])
        assert b.shape == (cfg.num_queries, 4)
        assert (b >= 0).all() and (b <= 1).all()   # sigmoid space

    def test_detector_wrapper(self, setup):
        cfg, params = setup
        det = GD.GroundingDINODetector(
            params, cfg, tiny_bert_tokenizer(), box_threshold=-1.0,
            short_side=64, max_side=96)
        img = np.random.RandomState(0).randint(
            0, 255, (80, 100, 3)).astype(np.uint8)
        boxes, scores, phrases = det(img, "a dog")
        # threshold -1 keeps everything: all queries survive
        assert boxes.shape == (cfg.num_queries, 4)
        assert len(phrases) == cfg.num_queries
