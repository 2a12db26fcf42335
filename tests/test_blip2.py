"""BLIP2 captioner tests (tiny architecture, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.models import blip2 as B
from editanything_tpu.text.tokenizer import tiny_gpt2_tokenizer


def _cfg():
    return B.tiny_blip2_config()


def _params(cfg):
    return B.init_blip2(jax.random.PRNGKey(0), cfg)


class TestBLIP2:
    def test_vision_encoder_shape(self):
        cfg = _cfg()
        p = _params(cfg)
        px = jax.random.normal(jax.random.PRNGKey(1),
                               (2, cfg.image_size, cfg.image_size, 3))
        out = B.vision_encoder(p, cfg, px)
        assert out.shape == (2, 1 + cfg.num_patches, cfg.vision_hidden)

    def test_qformer_shape(self):
        cfg = _cfg()
        p = _params(cfg)
        img = jax.random.normal(jax.random.PRNGKey(1),
                                (2, 1 + cfg.num_patches, cfg.vision_hidden))
        q = B.qformer(p, cfg, img)
        assert q.shape == (2, cfg.num_query_tokens, cfg.qformer_hidden)

    def test_kv_cache_decode_matches_full_forward(self):
        """Greedy decode with preallocated KV cache must produce the same
        tokens as re-running the full forward each step."""
        cfg = _cfg()
        p = _params(cfg)
        key = jax.random.PRNGKey(3)
        emb = jax.random.normal(key, (1, 5, cfg.opt_hidden)) * 0.5

        # incremental: prefill + 4 decode steps
        max_len = 5 + 4
        logits, caches = B._prefill_caches(p, cfg, emb, max_len)
        toks_inc = [int(jnp.argmax(logits, -1)[0])]
        embeds = emb
        pos = 5
        for _ in range(3):
            temb = p["language_model"]["embed_tokens"]["weight"][
                jnp.asarray([toks_inc[-1]])][:, None]
            embeds = jnp.concatenate([embeds, temb], axis=1)
            lg, caches = B.opt_forward(p, cfg, temb.astype(emb.dtype),
                                       caches=caches, pos=pos,
                                       total_len=max_len)
            toks_inc.append(int(jnp.argmax(lg[:, -1], -1)[0]))
            pos += 1

        # full recompute at each step
        toks_full = []
        embeds = emb
        for _ in range(4):
            lg, _ = B.opt_forward(p, cfg, embeds)
            t = int(jnp.argmax(lg[:, -1], -1)[0])
            toks_full.append(t)
            temb = p["language_model"]["embed_tokens"]["weight"][
                jnp.asarray([t])][:, None]
            embeds = jnp.concatenate([embeds, temb.astype(emb.dtype)],
                                     axis=1)

        assert toks_inc == toks_full

    def test_caption_fn_jits_and_stops_at_eos(self):
        cfg = _cfg()
        p = _params(cfg)
        fn = jax.jit(B.make_caption_fn(cfg, prompt_len=3, max_new_tokens=6))
        px = jax.random.normal(jax.random.PRNGKey(4),
                               (2, cfg.image_size, cfg.image_size, 3))
        prompt = jnp.ones((2, 3), jnp.int32)
        toks = fn(p, px, prompt)
        assert toks.shape == (2, 6)
        toks = np.asarray(toks)
        # after an eos, everything stays eos
        for row in toks:
            seen_eos = False
            for t in row:
                if seen_eos:
                    assert t == cfg.eos_token_id
                if t == cfg.eos_token_id:
                    seen_eos = True


class TestGPT2Tokenizer:
    def test_roundtrip_with_spaces(self):
        tok = tiny_gpt2_tokenizer()
        ids = tok.encode("a photo of")    # "of" unknown word -> bytes
        assert tok.decode(ids) == "a photo of"

    def test_space_prefix_tokens(self):
        tok = tiny_gpt2_tokenizer()
        ids1 = tok.encode("cat")
        ids2 = tok.encode(" cat")
        assert ids1 != ids2               # Ġcat vs cat
        assert tok.decode(ids2) == " cat"


class TestCaptioner:
    def test_captioner_and_semantic(self):
        import jax
        from editanything_tpu.models import blip2 as B2
        from editanything_tpu.pipelines.captioner import (Captioner,
                                                          semantic_labels)
        cfg = B2.tiny_blip2_config()
        p = B2.init_blip2(jax.random.PRNGKey(0), cfg)
        tok = tiny_gpt2_tokenizer()
        cap = Captioner(p, cfg, tok, max_new_tokens=4)
        img = np.random.RandomState(0).randint(
            0, 255, (2, 40, 40, 3)).astype(np.uint8)
        outs = cap(img)
        assert len(outs) == 2 and all(isinstance(s, str) for s in outs)

        masks = np.zeros((3, 40, 40), bool)
        masks[0, 5:30, 5:30] = True
        masks[1, 0:10, 30:40] = True
        valid = np.array([True, True, False])
        areas = masks.reshape(3, -1).sum(-1)
        labels = semantic_labels(img[0], masks, valid, areas, cap, top_k=5)
        assert len(labels) == 2
        assert labels[0][0] == 0      # largest mask first
