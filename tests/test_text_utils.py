"""Tests: host image utils, CLIP BPE tokenizer, long-prompt windowing."""

import numpy as np
import pytest

from editanything_tpu.utils import (HWC3, resize_image, resize_points,
                                    get_bounding_box)
from editanything_tpu.text.tokenizer import (CLIPTokenizer, tiny_tokenizer,
                                             bytes_to_unicode)


class TestImageUtils:
    def test_hwc3_gray(self):
        x = np.arange(12, dtype=np.uint8).reshape(3, 4)
        y = HWC3(x)
        assert y.shape == (3, 4, 3)
        assert (y[..., 0] == x).all() and (y[..., 2] == x).all()

    def test_hwc3_rgba_composites_on_white(self):
        x = np.zeros((2, 2, 4), np.uint8)
        x[..., :3] = 10
        x[..., 3] = 0          # fully transparent -> white
        assert (HWC3(x) == 255).all()
        x[..., 3] = 255        # opaque -> color
        assert (HWC3(x) == 10).all()

    def test_resize_image_64_multiple_short_side(self):
        img = np.zeros((480, 640, 3), np.uint8)
        out = resize_image(img, 512)
        assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
        # short side 480 -> 512: k = 512/480, H=512, W=round(640*k/64)*64
        assert out.shape[0] == 512
        assert out.shape[1] == int(round(640 * (512 / 480) / 64)) * 64

    def test_resize_points(self):
        pts = [(100, 50, 1)]
        out = resize_points(pts, (200, 400, 3), 100)
        assert out == [(50, 25, 1)]

    def test_bounding_box_reference_convention(self):
        m = np.zeros((10, 8, 3), np.uint8)
        m[2:5, 3:6, 0] = 1
        # reference convention: rows=any(axis=0) (over columns!),
        # cols=any(axis=1)
        assert get_bounding_box(m) == [3, 2, 5, 4]


class TestTokenizer:
    def test_bytes_to_unicode_bijective(self):
        m = bytes_to_unicode()
        assert len(m) == 256 and len(set(m.values())) == 256

    def test_tiny_roundtrip(self):
        tok = tiny_tokenizer()
        ids = tok.encode("a photo of a cat")
        assert tok.decode(ids) == "a photo of a cat"
        # fully-merged words are single tokens
        assert len(ids) == 5

    def test_call_fixed_shape(self):
        tok = tiny_tokenizer()
        out = tok(["a cat", "a photo of a dog"], pad_to=77)
        assert out.shape == (2, 77) and out.dtype == np.int32
        assert out[0, 0] == tok.bos_id
        assert (out[:, -1] == tok.eos_id).all()

    def test_unknown_word_falls_to_bytes(self):
        tok = tiny_tokenizer()
        ids = tok.encode("zq")
        assert len(ids) == 2           # unmerged chars
        assert tok.decode(ids) == "zq"

    def test_lowercase_and_whitespace(self):
        tok = tiny_tokenizer()
        assert tok.encode("  A   Cat ") == tok.encode("a cat")


class TestPromptWindows:
    def test_window_shapes_and_batching(self):
        import jax
        import jax.numpy as jnp
        from editanything_tpu.engine import prompts as P
        from editanything_tpu.models import clip_text as CT
        from editanything_tpu.models.config import CLIPTextConfig

        tok = tiny_tokenizer(context_length=8)
        cfg = CLIPTextConfig(vocab_size=2000, hidden_size=32,
                             intermediate_size=64, num_layers=2, num_heads=4,
                             max_position_embeddings=8)
        params = CT.init_clip_text(jax.random.PRNGKey(0), cfg)

        # short prompt: 1 window
        cond, uncond = P.get_pipeline_embeds(params, cfg, tok, "a cat", "")
        assert cond.shape == (1, 8, 32) and uncond.shape == (1, 8, 32)

        # long prompt: multiple windows, negative padded to match
        long_p = " ".join(["photo of a cat"] * 4)     # 16 tokens + bos/eos
        cond, uncond = P.get_pipeline_embeds(params, cfg, tok, long_p, "dog")
        assert cond.shape[1] == uncond.shape[1]
        assert cond.shape[1] % 8 == 0 and cond.shape[1] >= 16

    def test_window_ids_padding(self):
        from editanything_tpu.engine import prompts as P
        tok = tiny_tokenizer(context_length=8)
        pids, nids = P.window_ids(tok, "a photo of a cat dog cat dog", "cat")
        assert pids.shape == nids.shape
        assert pids.shape[1] == 8
        assert pids[0, 0] == tok.bos_id
        assert nids[0, 0] == tok.bos_id
        assert nids[-1, -1] == tok.eos_id


class TestLegacyConfig:
    def test_cldm_yaml_roundtrip(self, tmp_path):
        yaml_text = """
model:
  target: cldm.cldm.ControlLDM
  params:
    linear_start: 0.00085
    linear_end: 0.0120
    timesteps: 1000
    scale_factor: 0.18215
    parameterization: v
    sd_locked: true
    unet_config:
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 320
        num_res_blocks: 2
        channel_mult: [1, 2, 4, 4]
        num_head_channels: 64
        context_dim: 1024
        use_linear_in_transformer: true
    first_stage_config:
      params:
        ddconfig:
          z_channels: 4
          ch: 128
          ch_mult: [1, 2, 4, 4]
          num_res_blocks: 2
    cond_stage_config:
      target: ldm.modules.encoders.modules.FrozenOpenCLIPEmbedder
"""
        p = tmp_path / "cldm_v21.yaml"
        p.write_text(yaml_text)
        from editanything_tpu.checkpoints.legacy import configs_from_cldm_yaml
        out = configs_from_cldm_yaml(str(p))
        u = out["unet"]
        assert u.block_out_channels == (320, 640, 1280, 1280)
        assert u.attention_head_dim == (5, 10, 20, 20)   # 64-wide heads
        assert u.cross_attention_dim == 1024
        assert u.use_linear_projection
        assert out["text"].hidden_size == 1024            # OpenCLIP-H
        assert out["schedule"].prediction_type == "v_prediction"
        assert out["vae"].block_out_channels == (128, 256, 512, 512)
        assert out["sd_locked"]

    def test_save_input_to_file(self, tmp_path, monkeypatch):
        import pickle
        monkeypatch.chdir(tmp_path)
        from editanything_tpu.utils.image import save_input_to_file

        class Thing:
            @save_input_to_file
            def process(self, a, b=2):
                return a + b

        assert Thing().process(1, b=3) == 4
        data = pickle.load(open("input_data.pkl", "rb"))
        assert data["args"] == (1,) and data["kwargs"] == {"b": 3}
