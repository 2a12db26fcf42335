"""Real-checkpoint dress rehearsal: files-on-disk -> load_bundle -> edit.

Every converter is parity-tested piecewise elsewhere; this suite covers the
FULL load path in one shot — real-layout checkpoint files written to disk
(synthesized from the torch replicas' state_dict(), including HF quirks
like the safety checker's doubled vision_model prefix and CLIP's
position_ids buffer, plus the detectron2/DETR "model"-wrapped .pth layout)
loaded through the same entry points a user hits
(pipelines.load_bundle / checkpoints.*_to_tree via file paths), then a
2-step edit compared against an in-memory golden. Matches the reference's
weight intake surface: /root/reference/cldm/model.py:12-28 (safetensors/pt
dual loader), editany_lora.py:58-68 (SAM .pth), :197-329 (kohya LoRA),
:734 (TI embeddings), sam2groundingdino_edit.py:64-75 (DINO .pth).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from safetensors.numpy import save_file  # noqa: E402

from editanything_tpu.checkpoints.convert import (  # noqa: E402
    clip_text_to_tree, diffusers_to_tree, load_torch_state_dict,
    safety_checker_to_tree, sam_to_tree)
from editanything_tpu.checkpoints.lora import (load_ti_file,  # noqa: E402
                                               merge_kohya_lora)
from editanything_tpu.models import config as C  # noqa: E402
from editanything_tpu.models import sam as SAM  # noqa: E402
from editanything_tpu.pipelines import EditAnythingEditor  # noqa: E402
from editanything_tpu.pipelines.bundle import (ModelBundle,  # noqa: E402
                                               load_bundle)
from editanything_tpu.perception import AMGConfig  # noqa: E402
from editanything_tpu.text.tokenizer import tiny_tokenizer  # noqa: E402

import sd_replica as R  # noqa: E402
from sam_replica import Sam  # noqa: E402
from test_sd_parity import _randomize  # noqa: E402

UNET_CFG = C.UNetConfig(
    block_out_channels=(32, 64), layers_per_block=2,
    cross_attention_dim=48, attention_head_dim=(2, 2),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    norm_num_groups=8)
# 4 levels so the VAE keeps the production /8 spatial factor
VAE_CFG = C.VAEConfig(block_out_channels=(8, 8, 8, 16), layers_per_block=1,
                      latent_channels=4, norm_num_groups=4)
CN_CFG = C.ControlNetConfig(unet=UNET_CFG,
                            conditioning_embedding_channels=(4, 8, 8, 8))
SAM_CFG = SAM.SAMConfig(
    img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
    global_attn_indexes=(1,), window_size=4, out_chans=16,
    prompt_embed_dim=16, decoder_mlp_dim=32)


def _np_sd(module) -> dict:
    return _np(module.state_dict())


def _np(sd) -> dict:
    return {k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
            for k, v in sd.items()}


def _hf_clip_text(vocab_size: int):
    from transformers import CLIPTextConfig, CLIPTextModel
    torch.manual_seed(3)
    hf = CLIPTextModel(CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16)).eval()
    return _randomize(hf, seed=3)


def _kohya_lora_sd(rank=2, alpha=1.0, seed=7) -> dict:
    """kohya-naming LoRA entries for two UNet attention projections and one
    text-encoder projection (the layout editany_lora.py:197-329 merges)."""
    rng = np.random.RandomState(seed)
    sd = {}
    targets = [
        ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
         "_attn1_to_q", 32, 32),
        ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
         "_attn2_to_k", 48, 32),
        ("lora_te_text_model_encoder_layers_0_self_attn_q_proj", 48, 48),
    ]
    for name, din, dout in targets:
        sd[f"{name}.lora_down.weight"] = rng.randn(
            rank, din).astype(np.float32) * 0.1
        sd[f"{name}.lora_up.weight"] = rng.randn(
            dout, rank).astype(np.float32) * 0.1
        sd[f"{name}.alpha"] = np.asarray(alpha, np.float32)  # 0-d tensor
    return sd


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    """Write every checkpoint family to disk in its real layout."""
    d = tmp_path_factory.mktemp("ckpts")
    torch.manual_seed(0)
    unet_r = _randomize(R.UNetReplica(
        block_out_channels=(32, 64), layers_per_block=2, context_dim=48,
        heads=(2, 2), groups=8), seed=1)
    cn_sam = _randomize(R.ControlNetReplica(
        unet_r, cond_chans=(4, 8, 8, 8), block_out_channels=(32, 64),
        layers_per_block=2), seed=2)
    # a second ControlNet (the reference's extra inpaint control)
    unet_r2 = _randomize(R.UNetReplica(
        block_out_channels=(32, 64), layers_per_block=2, context_dim=48,
        heads=(2, 2), groups=8), seed=4)
    cn_inp = _randomize(R.ControlNetReplica(
        unet_r2, cond_chans=(4, 8, 8, 8), block_out_channels=(32, 64),
        layers_per_block=2), seed=5)
    vae_r = _randomize(R.VAEReplica(chans=(8, 8, 8, 16), layers=1, z=4,
                                    groups=4), seed=6)

    tok = tiny_tokenizer(context_length=16)
    vocab = len(tok.encoder)
    hf_text = _hf_clip_text(vocab)
    text_sd = _np_sd(hf_text)
    # real HF CLIP checkpoints carry the position_ids buffer
    text_sd["text_model.embeddings.position_ids"] = \
        np.arange(16, dtype=np.int64)[None]

    sam_r = Sam(img_size=SAM_CFG.img_size, patch_size=SAM_CFG.patch_size,
                embed_dim=SAM_CFG.embed_dim, depth=SAM_CFG.depth,
                num_heads=SAM_CFG.num_heads,
                global_attn_indexes=SAM_CFG.global_attn_indexes,
                window_size=SAM_CFG.window_size,
                out_chans=SAM_CFG.out_chans,
                decoder_heads=SAM_CFG.decoder_heads,
                decoder_mlp_dim=SAM_CFG.decoder_mlp_dim).eval()

    from test_safety import _full_sd, _hf_tiny
    safety_sd = _full_sd(_hf_tiny())

    paths = {
        "unet": str(d / "unet.safetensors"),
        "vae": str(d / "vae.safetensors"),
        "text": str(d / "text.safetensors"),
        "cn_sam": str(d / "controlnet_sam.safetensors"),
        "cn_inpaint": str(d / "controlnet_inpaint.safetensors"),
        "safety": str(d / "safety.safetensors"),
        "sam": str(d / "sam_vit_tiny.pth"),
        "lora": str(d / "kohya_lora.safetensors"),
        "ti_bin": str(d / "learned_embeds.bin"),
        "ti_npy": str(d / "learned_embeds.npy"),
    }
    save_file(_np_sd(unet_r), paths["unet"])
    save_file(_np_sd(vae_r), paths["vae"])
    save_file(text_sd, paths["text"])
    save_file(_np(cn_sam.state_dict_standalone()), paths["cn_sam"])
    save_file(_np(cn_inp.state_dict_standalone()), paths["cn_inpaint"])
    save_file(safety_sd, paths["safety"])
    # official SAM checkpoints are flat torch state dicts (.pth)
    torch.save(sam_r.state_dict(), paths["sam"])
    save_file(_kohya_lora_sd(), paths["lora"])
    # the reference's TI format: torch dict {placeholder: (N, D)}
    rng = np.random.RandomState(9)
    ti = rng.randn(2, 48).astype(np.float32)
    torch.save({"<new-obj>": torch.tensor(ti)}, paths["ti_bin"])
    np.save(paths["ti_npy"], ti)

    sds = {"unet": _np_sd(unet_r), "vae": _np_sd(vae_r),
           "text": text_sd, "cn_sam": _np(cn_sam.state_dict_standalone()),
           "cn_inpaint": _np(cn_inp.state_dict_standalone()),
           "sam": _np_sd(sam_r), "lora": _kohya_lora_sd(), "ti": ti,
           "safety": safety_sd}
    return paths, sds, tok


def _edit_kwargs(seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        mask=(np.mgrid[0:64, 0:64][0] > 32).astype(np.uint8) * 255,
        prompt="a photo of a cat", num_samples=1, image_resolution=64,
        detect_resolution=64, ddim_steps=2, seed=3)


class TestLoadBundleE2E:
    def test_files_to_edit_matches_in_memory_golden(self, files):
        paths, sds, tok = files
        tcfg = C.CLIPTextConfig(
            vocab_size=len(tok.encoder), hidden_size=48,
            intermediate_size=96, num_layers=2, num_heads=4,
            max_position_embeddings=16, eos_token_id=tok.eos_id)

        from editanything_tpu.models import safety as S
        bundle = load_bundle(
            unet_path=paths["unet"], vae_path=paths["vae"],
            text_path=paths["text"], tokenizer=tok,
            controlnet_paths={"sam": paths["cn_sam"],
                              "inpaint": paths["cn_inpaint"]},
            unet_cfg=UNET_CFG, vae_cfg=VAE_CFG, text_cfg=tcfg,
            controlnet_cfg=CN_CFG, safety_path=paths["safety"],
            safety_cfg=S.tiny_vision_config(),
            lora_specs=[(paths["lora"], 0.5)], dtype=jnp.float32)
        assert bundle.safety is not None

        sam_tree = sam_to_tree(load_torch_state_dict(paths["sam"]))
        amg = AMGConfig(points_per_side=4, points_per_batch=16,
                        max_masks=16)
        editor = EditAnythingEditor(bundle, sam=(SAM_CFG, sam_tree),
                                    extra_inpaint=True, tile_control="none",
                                    amg_config=amg)
        # condition_image=None -> the SAM auto-mask path runs off the
        # loaded .pth weights (editany_lora.py:765-774)
        tile, results, viz, prompt = editor.process(**_edit_kwargs())
        assert results[0].shape == (64, 64, 3)
        assert viz[0].shape == (64, 64, 3)      # SAM ID condition map

        # ---- golden: the same edit from in-memory-converted trees -----
        unet = diffusers_to_tree(sds["unet"], dtype=jnp.float32)
        text = clip_text_to_tree(sds["text"], dtype=jnp.float32)
        merge_kohya_lora({"unet": unet, "text_encoder": text},
                         sds["lora"], multiplier=0.5)
        from editanything_tpu.models.safety import SafetyChecker
        golden = ModelBundle(
            unet_cfg=UNET_CFG, vae_cfg=VAE_CFG, text_cfg=tcfg,
            unet=unet,
            vae=diffusers_to_tree(sds["vae"], dtype=jnp.float32),
            text=text, tokenizer=tok,
            controlnets={
                "sam": (CN_CFG, diffusers_to_tree(sds["cn_sam"],
                                                  dtype=jnp.float32)),
                "inpaint": (CN_CFG, diffusers_to_tree(
                    sds["cn_inpaint"], dtype=jnp.float32))},
            dtype=jnp.float32,
            safety=SafetyChecker(safety_checker_to_tree(sds["safety"]),
                                 S.tiny_vision_config()))
        editor_g = EditAnythingEditor(golden, sam=(SAM_CFG,
                                                   sam_to_tree(sds["sam"])),
                                      extra_inpaint=True,
                                      tile_control="none", amg_config=amg)
        _, results_g, viz_g, _ = editor_g.process(**_edit_kwargs())
        np.testing.assert_array_equal(np.asarray(viz[0]),
                                      np.asarray(viz_g[0]))
        # safety checker may black out whole random images; compare the
        # pre-safety pixels via the golden (no-safety) bundle tolerance
        np.testing.assert_allclose(
            np.asarray(results[0], np.int32),
            np.asarray(results_g[0], np.int32), atol=1)

    def test_lora_actually_merged(self, files):
        paths, sds, tok = files
        tcfg = C.CLIPTextConfig(
            vocab_size=len(tok.encoder), hidden_size=48,
            intermediate_size=96, num_layers=2, num_heads=4,
            max_position_embeddings=16, eos_token_id=tok.eos_id)
        kw = dict(unet_path=paths["unet"], vae_path=paths["vae"],
                  text_path=paths["text"], tokenizer=tok,
                  controlnet_paths={}, unet_cfg=UNET_CFG, vae_cfg=VAE_CFG,
                  text_cfg=tcfg, dtype=jnp.float32)
        plain = load_bundle(**kw)
        merged = load_bundle(lora_specs=[(paths["lora"], 1.0)], **kw)
        q = lambda b: np.asarray(
            b.unet["down_blocks"]["0"]["attentions"]["0"]
            ["transformer_blocks"]["0"]["attn1"]["to_q"]["kernel"])
        assert np.abs(q(plain) - q(merged)).max() > 1e-6
        tq = lambda b: np.asarray(
            b.text["encoder"]["layers"]["0"]["self_attn"]["q_proj"]
            ["kernel"])
        assert np.abs(tq(plain) - tq(merged)).max() > 1e-6

    def test_ti_file_formats(self, files):
        paths, sds, _ = files
        a = load_ti_file(paths["ti_bin"])     # torch {token: tensor}
        b = load_ti_file(paths["ti_npy"])     # native .npy
        np.testing.assert_allclose(a, sds["ti"], atol=0)
        np.testing.assert_allclose(b, sds["ti"], atol=0)
        assert a.shape == (2, 48)

    def test_ti_bin_loads_into_editor(self, files, tmp_path):
        """The reference's learned_embeds.bin format flows through
        process(ref_textinv_path=...) (editany_lora.py:734)."""
        paths, sds, tok = files
        from editanything_tpu.pipelines import random_bundle
        bundle = random_bundle(jax.random.PRNGKey(0), tiny=True,
                               controlnet_names=("sam",))
        editor = EditAnythingEditor(bundle, extra_inpaint=False,
                                    tile_control="none")
        v0 = bundle.text["embeddings"]["token_embedding"][
            "weight"].shape[0]
        # tiny text hidden is 32; write a matching-width .bin
        ti = np.random.RandomState(0).randn(2, 32).astype(np.float32)
        p = str(tmp_path / "emb.bin")
        torch.save({"<new-obj>": torch.tensor(ti)}, p)
        loaded = editor._load_or_stage_textinv(
            np.zeros((8, 8, 3), np.uint8), p)
        assert loaded
        table = bundle.text["embeddings"]["token_embedding"]["weight"]
        assert table.shape[0] == v0 + 2
        assert bundle.tokenizer.placeholders["<new-obj>"] == [v0, v0 + 1]

    def test_wrapped_model_pth_unwraps(self, files, tmp_path):
        """detectron2 / DETR .pth files wrap weights under 'model'
        (VLPart swinbase_part_0a0000.pth, groundingdino_swint_ogc.pth)."""
        paths, sds, _ = files
        p = str(tmp_path / "wrapped.pth")
        torch.save({"model": {k: torch.tensor(v)
                              for k, v in sds["lora"].items()},
                    "iteration": 5}, p)
        sd = load_torch_state_dict(p)
        assert set(sd) == set(sds["lora"])

    def test_dino_pth_roundtrip(self, tmp_path):
        """groundingdino_swint_ogc.pth layout ({'model': sd}) loads
        through load_torch_state_dict + dino_to_tree from disk."""
        from editanything_tpu.checkpoints.detectors import dino_to_tree
        from editanything_tpu.models import groundingdino as GD
        from dino_replica import TinyDINOReplica
        from test_convert import tree_paths
        cfg = GD.tiny_dino_config()
        torch.manual_seed(0)
        m = TinyDINOReplica(
            swin_dim=cfg.swin.embed_dim, swin_depths=(2, 1, 1, 1),
            swin_heads=cfg.swin.num_heads, swin_window=cfg.swin.window_size,
            d=cfg.hidden_dim, heads=cfg.nheads, ffn=cfg.dim_feedforward,
            levels=cfg.num_feature_levels, points=cfg.n_points,
            enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
            num_queries=cfg.num_queries, gn_groups=cfg.input_proj_groups,
            pe_temperature=cfg.pe_temperature).eval()
        p = str(tmp_path / "dino.pth")
        torch.save({"model": m.state_dict()}, p)
        tree = dino_to_tree(load_torch_state_dict(p))
        want = GD.init_dino(jax.random.PRNGKey(0), cfg)
        assert tree_paths(tree) == tree_paths(want)
