"""Checkpoint converter tests against REAL torch/HF module state dicts.

The strongest structure check available offline: instantiate tiny HF/torch
models, convert their state dicts, and require the resulting tree paths to
exactly match our init_* trees — plus numeric forward parity for BERT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.checkpoints.convert import (bert_to_tree,
                                                  blip2_to_tree,
                                                  swin_to_tree,
                                                  state_dict_to_tree)


def tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= tree_paths(v, prefix + (k,))
        else:
            out.add("/".join(prefix + (k,)) + f":{tuple(np.shape(v))}")
    return out


class TestBertConvert:
    @pytest.fixture(scope="class")
    def hf(self):
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel
        cfg = BertConfig(vocab_size=200, hidden_size=16,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=32, max_position_embeddings=32,
                         type_vocab_size=2)
        torch.manual_seed(0)
        return BertModel(cfg).eval()

    def test_structure_matches_init(self, hf):
        from editanything_tpu.models import groundingdino as GD
        bc = GD.BertConfig(vocab_size=200, hidden=16, layers=1, heads=2,
                           intermediate=32, max_positions=32)
        ours = GD.init_bert(jax.random.PRNGKey(0), bc)
        conv = bert_to_tree({k: v.detach().numpy()
                             for k, v in hf.state_dict().items()})
        assert tree_paths(conv) == tree_paths(ours)

    def test_forward_parity(self, hf):
        import torch
        from editanything_tpu.models import groundingdino as GD
        bc = GD.BertConfig(vocab_size=200, hidden=16, layers=1, heads=2,
                           intermediate=32, max_positions=32)
        params = bert_to_tree({k: v.detach().numpy()
                               for k, v in hf.state_dict().items()})
        ids = np.array([[2, 7, 9, 3, 0, 0]], np.int64)
        mask = np.array([[1, 1, 1, 1, 0, 0]], bool)
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask.astype(np.int64))
                     ).last_hidden_state.numpy()
        ours = np.asarray(GD.bert_apply(params, bc, jnp.asarray(ids),
                                        jnp.asarray(mask)))
        # only unmasked positions are comparable
        np.testing.assert_allclose(ours[0, :4], ref[0, :4],
                                   rtol=5e-3, atol=5e-4)


class TestBlip2Convert:
    def test_structure_matches_init(self):
        pytest.importorskip("torch")
        from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                                  Blip2QFormerConfig, Blip2VisionConfig,
                                  OPTConfig)
        from editanything_tpu.models import blip2 as B2
        vc = Blip2VisionConfig(hidden_size=16, intermediate_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               image_size=28, patch_size=14)
        qc = Blip2QFormerConfig(hidden_size=16, num_hidden_layers=2,
                                num_attention_heads=2, intermediate_size=32,
                                encoder_hidden_size=16,
                                cross_attention_frequency=2)
        tc = OPTConfig(hidden_size=16, num_hidden_layers=2, ffn_dim=32,
                       num_attention_heads=2, vocab_size=128,
                       max_position_embeddings=64, word_embed_proj_dim=16)
        cfg = Blip2Config.from_vision_qformer_text_configs(
            vc, qc, tc, num_query_tokens=4)
        hf = Blip2ForConditionalGeneration(cfg)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
              if not k.startswith("language_model.lm_head")}
        conv = blip2_to_tree(sd)

        ours = B2.init_blip2(jax.random.PRNGKey(0), B2.tiny_blip2_config())
        missing = tree_paths(ours) - tree_paths(conv)
        extra = tree_paths(conv) - tree_paths(ours)
        assert not missing, f"missing from conversion: {sorted(missing)[:8]}"
        assert not extra, f"unexpected in conversion: {sorted(extra)[:8]}"


class TestSwinConvert:
    def test_structure_matches_init(self):
        torch = pytest.importorskip("torch")
        from editanything_tpu.models import swin as SW
        cfg = SW.SwinConfig(embed_dim=16, depths=(1, 2), num_heads=(2, 4),
                            window_size=4, out_indices=(0, 1))
        ours = SW.init_swin(jax.random.PRNGKey(0), cfg)

        # synthesize a torch-named state dict with the official layout
        sd = {}
        w = cfg.window_size
        sd["patch_embed.proj.weight"] = np.zeros((16, 3, 4, 4), np.float32)
        sd["patch_embed.proj.bias"] = np.zeros((16,), np.float32)
        sd["patch_embed.norm.weight"] = np.ones((16,), np.float32)
        sd["patch_embed.norm.bias"] = np.zeros((16,), np.float32)
        for li, (depth, dim, heads) in enumerate(
                [(1, 16, 2), (2, 32, 4)]):
            for b in range(depth):
                p = f"layers.{li}.blocks.{b}"
                sd[f"{p}.norm1.weight"] = np.ones((dim,), np.float32)
                sd[f"{p}.norm1.bias"] = np.zeros((dim,), np.float32)
                sd[f"{p}.attn.qkv.weight"] = np.zeros((3 * dim, dim),
                                                      np.float32)
                sd[f"{p}.attn.qkv.bias"] = np.zeros((3 * dim,), np.float32)
                sd[f"{p}.attn.proj.weight"] = np.zeros((dim, dim), np.float32)
                sd[f"{p}.attn.proj.bias"] = np.zeros((dim,), np.float32)
                sd[f"{p}.attn.relative_position_bias_table"] = \
                    np.zeros(((2 * w - 1) ** 2, heads), np.float32)
                sd[f"{p}.attn.relative_position_index"] = \
                    np.zeros((w * w, w * w), np.int64)   # must be dropped
                sd[f"{p}.norm2.weight"] = np.ones((dim,), np.float32)
                sd[f"{p}.norm2.bias"] = np.zeros((dim,), np.float32)
                sd[f"{p}.mlp.fc1.weight"] = np.zeros((4 * dim, dim),
                                                     np.float32)
                sd[f"{p}.mlp.fc1.bias"] = np.zeros((4 * dim,), np.float32)
                sd[f"{p}.mlp.fc2.weight"] = np.zeros((dim, 4 * dim),
                                                     np.float32)
                sd[f"{p}.mlp.fc2.bias"] = np.zeros((dim,), np.float32)
        sd["layers.0.downsample.norm.weight"] = np.ones((64,), np.float32)
        sd["layers.0.downsample.norm.bias"] = np.zeros((64,), np.float32)
        sd["layers.0.downsample.reduction.weight"] = np.zeros((32, 64),
                                                              np.float32)
        for i, dim in [(0, 16), (1, 32)]:
            sd[f"norm{i}.weight"] = np.ones((dim,), np.float32)
            sd[f"norm{i}.bias"] = np.zeros((dim,), np.float32)

        conv = swin_to_tree(sd)
        assert tree_paths(conv) == tree_paths(ours)


class TestVLPartConvert:
    def test_structure_matches_init(self):
        from editanything_tpu.checkpoints.detectors import vlpart_to_tree
        from editanything_tpu.models import vlpart as VP
        cfg = VP.tiny_vlpart_config()
        ours = VP.init_vlpart(jax.random.PRNGKey(0), cfg)

        sd = {}
        z = lambda *s: np.zeros(s, np.float32)
        # --- swin backbone (detectron2 prefix)
        sw = cfg.swin
        p = "backbone.bottom_up."
        sd[p + "patch_embed.proj.weight"] = z(sw.embed_dim, 3, 4, 4)
        sd[p + "patch_embed.proj.bias"] = z(sw.embed_dim)
        sd[p + "patch_embed.norm.weight"] = z(sw.embed_dim)
        sd[p + "patch_embed.norm.bias"] = z(sw.embed_dim)
        w = sw.window_size
        for li, depth in enumerate(sw.depths):
            dim = sw.stage_dim(li)
            heads = sw.num_heads[li]
            for b in range(depth):
                q = f"{p}layers.{li}.blocks.{b}"
                sd[f"{q}.norm1.weight"] = z(dim)
                sd[f"{q}.norm1.bias"] = z(dim)
                sd[f"{q}.attn.qkv.weight"] = z(3 * dim, dim)
                sd[f"{q}.attn.qkv.bias"] = z(3 * dim)
                sd[f"{q}.attn.proj.weight"] = z(dim, dim)
                sd[f"{q}.attn.proj.bias"] = z(dim)
                sd[f"{q}.attn.relative_position_bias_table"] = \
                    z((2 * w - 1) ** 2, heads)
                sd[f"{q}.attn.relative_position_index"] = \
                    np.zeros((w * w, w * w), np.int64)
                sd[f"{q}.norm2.weight"] = z(dim)
                sd[f"{q}.norm2.bias"] = z(dim)
                sd[f"{q}.mlp.fc1.weight"] = z(4 * dim, dim)
                sd[f"{q}.mlp.fc1.bias"] = z(4 * dim)
                sd[f"{q}.mlp.fc2.weight"] = z(dim, 4 * dim)
                sd[f"{q}.mlp.fc2.bias"] = z(dim)
            if li < len(sw.depths) - 1:
                sd[f"{p}layers.{li}.downsample.norm.weight"] = z(4 * dim)
                sd[f"{p}layers.{li}.downsample.norm.bias"] = z(4 * dim)
                sd[f"{p}layers.{li}.downsample.reduction.weight"] = \
                    z(2 * dim, 4 * dim)
        for i in sw.out_indices:
            sd[f"{p}norm{i}.weight"] = z(sw.stage_dim(i))
            sd[f"{p}norm{i}.bias"] = z(sw.stage_dim(i))
        # --- FPN
        c = cfg.fpn_channels
        for lvl, dim in zip((2, 3, 4, 5),
                            [sw.stage_dim(i) for i in range(4)]):
            sd[f"backbone.fpn_lateral{lvl}.weight"] = z(c, dim, 1, 1)
            sd[f"backbone.fpn_lateral{lvl}.bias"] = z(c)
            sd[f"backbone.fpn_output{lvl}.weight"] = z(c, c, 3, 3)
            sd[f"backbone.fpn_output{lvl}.bias"] = z(c)
        # --- RPN
        a = cfg.num_anchors
        sd["proposal_generator.rpn_head.conv.weight"] = z(c, c, 3, 3)
        sd["proposal_generator.rpn_head.conv.bias"] = z(c)
        sd["proposal_generator.rpn_head.objectness_logits.weight"] = \
            z(a, c, 1, 1)
        sd["proposal_generator.rpn_head.objectness_logits.bias"] = z(a)
        sd["proposal_generator.rpn_head.anchor_deltas.weight"] = \
            z(4 * a, c, 1, 1)
        sd["proposal_generator.rpn_head.anchor_deltas.bias"] = z(4 * a)
        # --- cascade heads
        pooled = c * cfg.pooler_resolution ** 2
        fc = cfg.box_head_fc_dim
        for k in range(cfg.num_cascade_stages):
            sd[f"roi_heads.box_head.{k}.fc1.weight"] = z(fc, pooled)
            sd[f"roi_heads.box_head.{k}.fc1.bias"] = z(fc)
            sd[f"roi_heads.box_head.{k}.fc2.weight"] = z(fc, fc)
            sd[f"roi_heads.box_head.{k}.fc2.bias"] = z(fc)
            sd[f"roi_heads.box_predictor.{k}.bbox_pred.0.weight"] = z(fc, fc)
            sd[f"roi_heads.box_predictor.{k}.bbox_pred.0.bias"] = z(fc)
            sd[f"roi_heads.box_predictor.{k}.bbox_pred.2.weight"] = z(4, fc)
            sd[f"roi_heads.box_predictor.{k}.bbox_pred.2.bias"] = z(4)
            sd[f"roi_heads.box_predictor.{k}.cls_score.linear.weight"] = \
                z(cfg.zs_weight_dim, fc)
            sd[f"roi_heads.box_predictor.{k}.cls_score.linear.bias"] = \
                z(cfg.zs_weight_dim)
        # --- CLIP-RN50 text tower (open_clip naming)
        t = cfg.text
        sd["text_encoder.token_embedding.weight"] = z(t.vocab_size,
                                                      t.hidden_size)
        sd["text_encoder.positional_embedding"] = \
            z(t.max_position_embeddings, t.hidden_size)
        sd["text_encoder.ln_final.weight"] = z(t.hidden_size)
        sd["text_encoder.ln_final.bias"] = z(t.hidden_size)
        sd["text_encoder.text_projection"] = z(t.hidden_size,
                                               cfg.zs_weight_dim)
        for n in range(t.num_layers):
            q = f"text_encoder.transformer.resblocks.{n}"
            sd[f"{q}.attn.in_proj_weight"] = z(3 * t.hidden_size,
                                               t.hidden_size)
            sd[f"{q}.attn.in_proj_bias"] = z(3 * t.hidden_size)
            sd[f"{q}.attn.out_proj.weight"] = z(t.hidden_size, t.hidden_size)
            sd[f"{q}.attn.out_proj.bias"] = z(t.hidden_size)
            sd[f"{q}.ln_1.weight"] = z(t.hidden_size)
            sd[f"{q}.ln_1.bias"] = z(t.hidden_size)
            sd[f"{q}.ln_2.weight"] = z(t.hidden_size)
            sd[f"{q}.ln_2.bias"] = z(t.hidden_size)
            sd[f"{q}.mlp.c_fc.weight"] = z(t.intermediate_size,
                                           t.hidden_size)
            sd[f"{q}.mlp.c_fc.bias"] = z(t.intermediate_size)
            sd[f"{q}.mlp.c_proj.weight"] = z(t.hidden_size,
                                             t.intermediate_size)
            sd[f"{q}.mlp.c_proj.bias"] = z(t.hidden_size)
        sd["pixel_mean"] = z(3, 1, 1)
        sd["pixel_std"] = z(3, 1, 1)

        conv = vlpart_to_tree(sd)
        missing = tree_paths(ours) - tree_paths(conv)
        extra = tree_paths(conv) - tree_paths(ours)
        assert not missing, f"missing: {sorted(missing)[:10]}"
        assert not extra, f"extra: {sorted(extra)[:10]}"


class TestCLIPTextParity:
    def test_forward_parity_vs_hf(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel
        from editanything_tpu.checkpoints.convert import clip_text_to_tree
        from editanything_tpu.models import clip_text as CT
        from editanything_tpu.models.config import CLIPTextConfig

        hf_cfg = HFCfg(vocab_size=200, hidden_size=16,
                       intermediate_size=32, num_hidden_layers=2,
                       num_attention_heads=2, max_position_embeddings=16,
                       hidden_act="quick_gelu")
        torch.manual_seed(0)
        hf = CLIPTextModel(hf_cfg).eval()
        params = clip_text_to_tree({k: v.detach().numpy()
                                    for k, v in hf.state_dict().items()})
        cfg = CLIPTextConfig(vocab_size=200, hidden_size=16,
                             intermediate_size=32, num_layers=2,
                             num_heads=2, max_position_embeddings=16,
                             hidden_act="quick_gelu")
        ids = np.array([[3, 7, 11, 2, 2, 2, 2, 2]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids)
                     ).last_hidden_state.numpy()
        ours = np.asarray(CT.apply(params, cfg, jnp.asarray(ids)))
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=1e-4)


class TestBlip2CaptionParity:
    def test_greedy_caption_matches_hf_generate(self):
        torch = pytest.importorskip("torch")
        from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                                  Blip2QFormerConfig, Blip2VisionConfig,
                                  OPTConfig)
        from editanything_tpu.checkpoints.convert import blip2_to_tree
        from editanything_tpu.models import blip2 as B2

        vc = Blip2VisionConfig(hidden_size=16, intermediate_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               image_size=28, patch_size=14,
                               hidden_act="gelu")
        qc = Blip2QFormerConfig(hidden_size=16, num_hidden_layers=2,
                                num_attention_heads=2, intermediate_size=32,
                                encoder_hidden_size=16,
                                cross_attention_frequency=2)
        tc = OPTConfig(hidden_size=16, num_hidden_layers=2, ffn_dim=32,
                       num_attention_heads=2, vocab_size=128,
                       max_position_embeddings=64, word_embed_proj_dim=16,
                       activation_function="relu",
                       do_layer_norm_before=True)
        cfg_hf = Blip2Config.from_vision_qformer_text_configs(
            vc, qc, tc, num_query_tokens=4)
        cfg_hf.image_token_index = 99
        torch.manual_seed(1)
        hf = Blip2ForConditionalGeneration(cfg_hf).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
              if not k.startswith("language_model.lm_head")}
        params = blip2_to_tree(sd)
        cfg = B2.tiny_blip2_config()

        rng = np.random.RandomState(0)
        px = rng.randn(1, 28, 28, 3).astype(np.float32) * 0.5
        prompt_ids = np.array([[2]], np.int64)      # BOS only
        # modern HF BLIP2: image placeholder tokens mark where the query
        # embeds go (before the text prompt)
        hf_ids = np.array([[99, 99, 99, 99, 2]], np.int64)

        with torch.no_grad():
            out_hf = hf.generate(
                pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)),
                input_ids=torch.tensor(hf_ids),
                max_new_tokens=6, do_sample=False, num_beams=1)
        ref_tokens = out_hf[0].numpy().tolist()

        fn = jax.jit(B2.make_caption_fn(cfg, prompt_len=1,
                                        max_new_tokens=6))
        toks = np.asarray(fn(params, jnp.asarray(px),
                             jnp.asarray(prompt_ids, jnp.int32)))[0]
        # HF prepends the prompt ids to its output; strip them
        ref_new = [t for t in ref_tokens if True][-6:]
        got = toks.tolist()
        # compare until the first eos in either
        for a, b in zip(got, ref_new):
            assert a == b, (got, ref_new)
            if a == cfg.eos_token_id:
                break
