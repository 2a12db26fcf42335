"""Textual inversion + DreamBooth-inpaint training tests (tiny models)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from editanything_tpu.models import clip_text as CT
from editanything_tpu.models import config as C
from editanything_tpu.models import unet as UN
from editanything_tpu.samplers import make_schedule
from editanything_tpu.text.tokenizer import tiny_tokenizer
from editanything_tpu.train import textual_inversion as TI
from editanything_tpu.train import dreambooth_inpaint as DB


def _tiny_unet_cfg(in_channels=4):
    return C.UNetConfig(
        in_channels=in_channels,
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)


TCFG = C.CLIPTextConfig(vocab_size=600, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4,
                        max_position_embeddings=16)


class TestTextualInversion:
    def test_only_placeholder_rows_update(self):
        tok = tiny_tokenizer(context_length=16)
        text_params = CT.init_clip_text(jax.random.PRNGKey(0), TCFG)
        text_params, pids = TI.add_placeholder_tokens(
            text_params, tok, num_vectors=3, initializer_token="cat")
        assert len(pids) == 3

        ucfg = _tiny_unet_cfg()
        unet_params = UN.init_unet(jax.random.PRNGKey(1), ucfg)
        opt = optax.adam(1e-2)
        step = TI.make_ti_train_step(TCFG, ucfg, make_schedule(), opt, pids)

        table0 = text_params["embeddings"]["token_embedding"]["weight"]
        state = TI.TIState(table0, opt.init(table0), jnp.asarray(0))
        ids = TI.placeholder_prompt_ids(tok, "a photo of a {}", pids, 16)
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4)),
            "input_ids": jnp.asarray([ids, ids], jnp.int32),
        }
        state, metrics = jax.jit(step)(state, text_params, unet_params,
                                       batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        diff = np.abs(np.asarray(state.embeddings) - np.asarray(table0))
        changed_rows = np.nonzero(diff.sum(-1) > 0)[0]
        assert set(changed_rows.tolist()) <= set(pids)
        assert len(changed_rows) > 0

    def test_save_and_load_roundtrip(self):
        tok = tiny_tokenizer(context_length=16)
        p = CT.init_clip_text(jax.random.PRNGKey(0), TCFG)
        p2, pids = TI.add_placeholder_tokens(p, tok, num_vectors=2,
                                             initializer_token="dog")
        state = TI.TIState(
            p2["embeddings"]["token_embedding"]["weight"],
            None, jnp.asarray(0))
        embeds = TI.learned_embeddings(state, pids)
        assert embeds.shape == (2, TCFG.hidden_size)
        p3, new_ids = TI.load_textual_inversion(p, embeds)
        assert new_ids == pids
        np.testing.assert_array_equal(
            np.asarray(p3["embeddings"]["token_embedding"]["weight"][
                new_ids[0]]),
            np.asarray(embeds[0]))


class TestDreamBooth:
    def test_random_mask_bounds(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            m = DB.random_mask(rng, (32, 24))
            assert m.shape == (32, 24)
            assert set(np.unique(m)) <= {0.0, 1.0}
        full = DB.random_mask(rng, (16, 16), mask_full_image=True)
        assert full.mean() > 0.9

    def test_db_step_9ch(self):
        ucfg = _tiny_unet_cfg(in_channels=9)
        params = UN.init_unet(jax.random.PRNGKey(0), ucfg)
        opt = optax.adam(1e-3)
        step = DB.make_db_train_step(ucfg, make_schedule(), opt,
                                     prior_loss_weight=1.0)
        state = DB.DBState(params, opt.init(params), jnp.asarray(0))
        b = 4   # [instance; class] halves
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4)),
            "mask": jnp.ones((b, 8, 8, 1)),
            "masked_latents": jnp.zeros((b, 8, 8, 4)),
            "context": jax.random.normal(jax.random.PRNGKey(2), (b, 4, 32)),
        }
        state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

    def test_lora_deltas_zero_init_identity(self):
        ucfg = _tiny_unet_cfg()
        params = UN.init_unet(jax.random.PRNGKey(0), ucfg)
        deltas = DB.init_lora_deltas(jax.random.PRNGKey(1), params, rank=2)
        assert len(deltas) > 0
        merged = DB.apply_lora_deltas(params, deltas)
        # up is zero-init => merged == params
        a = jax.tree.leaves(params)
        b = jax.tree.leaves(merged)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_lora_step_trains_deltas_only(self):
        ucfg = _tiny_unet_cfg(in_channels=9)
        params = UN.init_unet(jax.random.PRNGKey(0), ucfg)
        deltas = DB.init_lora_deltas(jax.random.PRNGKey(1), params, rank=2)
        opt = optax.adam(1e-2)
        step = DB.make_db_lora_train_step(ucfg, make_schedule(), opt)
        carry = (deltas, opt.init(deltas), jnp.asarray(0))
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)),
            "mask": jnp.ones((2, 8, 8, 1)),
            "masked_latents": jnp.zeros((2, 8, 8, 4)),
            "context": jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32)),
        }
        carry, metrics = jax.jit(step)(carry, params, batch,
                                       jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        new_deltas = carry[0]
        moved = any(
            float(jnp.abs(d["up"]).max()) > 0 for d in new_deltas.values())
        assert moved
