"""Checkpoint surgery + LoRA merge + roundtrip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.checkpoints import (diffusers_to_tree,
                                          graft_controlnet_from_unet,
                                          merge_kohya_lora,
                                          tree_to_diffusers)
from editanything_tpu.models import config as C
from editanything_tpu.models import controlnet as CN
from editanything_tpu.models import unet as U


def _tiny_cfg():
    return C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=(2, 2),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)


class TestSurgery:
    def test_graft_copies_encoder_and_keeps_zero_convs(self):
        ucfg = _tiny_cfg()
        unet = U.init_unet(jax.random.PRNGKey(0), ucfg)
        cn0 = CN.init_controlnet(jax.random.PRNGKey(1),
                                 C.ControlNetConfig(unet=ucfg))
        cn = graft_controlnet_from_unet(unet, cn0)
        # encoder copied from the UNet
        np.testing.assert_array_equal(
            np.asarray(cn["down_blocks"]["0"]["resnets"]["0"]["conv1"]
                       ["kernel"]),
            np.asarray(unet["down_blocks"]["0"]["resnets"]["0"]["conv1"]
                       ["kernel"]))
        # zero convs remain zero (training starts as a no-op)
        assert float(jnp.abs(
            cn["controlnet_down_blocks"]["0"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(
            cn["controlnet_mid_block"]["kernel"]).max()) == 0.0

    def test_tree_to_diffusers_roundtrip(self):
        ucfg = _tiny_cfg()
        unet = U.init_unet(jax.random.PRNGKey(0), ucfg)
        sd = tree_to_diffusers(unet)
        back = diffusers_to_tree(sd)
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_flatten_with_path(unet)[0],
                jax.tree_util.tree_flatten_with_path(back)[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLoRA:
    def test_merge_matches_reference_formula(self):
        """W += multiplier * (alpha/rank) * up @ down on the torch layout
        (editany_lora.py:300-325)."""
        ucfg = _tiny_cfg()
        unet = U.init_unet(jax.random.PRNGKey(0), ucfg)
        tgt = unet["down_blocks"]["0"]["attentions"]["0"][
            "transformer_blocks"]["0"]["attn1"]["to_q"]
        w_before = np.asarray(tgt["kernel"])      # (in, out)
        din, dout = w_before.shape
        rank = 4
        rng = np.random.RandomState(0)
        up = rng.randn(dout, rank).astype(np.float32)       # (out, r)
        down = rng.randn(rank, din).astype(np.float32)      # (r, in)
        sd = {
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_"
            "attn1_to_q.lora_up.weight": up,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_"
            "attn1_to_q.lora_down.weight": down,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_"
            "attn1_to_q.alpha": np.asarray(8.0, np.float32),
        }
        stats = merge_kohya_lora({"unet": unet}, sd, multiplier=0.5)
        assert stats["merged"] == 1 and stats["skipped"] == 0
        w_after = np.asarray(
            unet["down_blocks"]["0"]["attentions"]["0"]
            ["transformer_blocks"]["0"]["attn1"]["to_q"]["kernel"])
        expected = w_before + 0.5 * (8.0 / rank) * (up @ down).T
        np.testing.assert_allclose(w_after, expected, rtol=1e-5)

    def test_unknown_targets_skipped(self):
        ucfg = _tiny_cfg()
        unet = U.init_unet(jax.random.PRNGKey(0), ucfg)
        sd = {"lora_unet_nonexistent_module.lora_up.weight":
              np.zeros((4, 2), np.float32),
              "lora_unet_nonexistent_module.lora_down.weight":
              np.zeros((2, 4), np.float32)}
        stats = merge_kohya_lora({"unet": unet}, sd)
        assert stats["merged"] == 0 and stats["skipped"] == 1
