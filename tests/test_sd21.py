"""SD2.1 end-to-end slice: v-prediction + OpenCLIP-style text tower +
linear-projection transformers through the FULL engine.

The reference runs SD2.1 for its vlpart/dino edits and half its model zoo
(/root/reference/models/cldm_v21.yaml:1-85 — parameterization: v, OpenCLIP
ViT-H penultimate, use_linear_in_transformer, 64-ch heads;
sam2vlpart_edit.py:224-235). Before round 5 only sampler-level v-pred math
was covered; this suite drives a tiny SD2.1-shaped bundle (v-pred schedule
on the bundle, gelu text tower, linear proj_in/out) through every inpaint
mode, ref control, and all samplers.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from editanything_tpu.models import clip_text as CT
from editanything_tpu.models import config as C
from editanything_tpu.models import controlnet as CN
from editanything_tpu.models import unet as U
from editanything_tpu.models import vae as V
from editanything_tpu.pipelines import EditPipeline, GenerationPipeline
from editanything_tpu.pipelines.bundle import ModelBundle
from editanything_tpu.samplers import make_schedule
from editanything_tpu.text.tokenizer import tiny_tokenizer


def tiny_sd21_bundle(key=None, prediction_type="v_prediction"):
    """Tiny bundle with SD2.1's structural traits (cldm_v21.yaml): linear
    transformer projections, channels//heads = fixed head width, gelu text
    tower at penultimate semantics (layer_skip 0 on a truncated stack),
    and a v-prediction schedule ON THE BUNDLE."""
    key = jax.random.PRNGKey(20) if key is None else key
    ks = jax.random.split(key, 8)
    ucfg = C.UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=48, attention_head_dim=(2, 4),
        use_linear_projection=True,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=8)
    vcfg = C.VAEConfig(block_out_channels=(16, 32, 32, 32),
                       layers_per_block=1, norm_num_groups=8)
    tok = tiny_tokenizer(context_length=16)
    tcfg = C.CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=48, intermediate_size=192,
        num_layers=2, num_heads=4, max_position_embeddings=16,
        hidden_act="gelu", layer_skip=0, eos_token_id=tok.eos_id)
    cn_cfg = C.ControlNetConfig(unet=ucfg,
                                conditioning_embedding_channels=(4, 8, 8, 8))
    return ModelBundle(
        unet_cfg=ucfg, vae_cfg=vcfg, text_cfg=tcfg,
        unet=U.init_unet(ks[0], ucfg, jnp.float32),
        vae=V.init_vae(ks[1], vcfg, jnp.float32),
        text=CT.init_clip_text(ks[2], tcfg, jnp.float32),
        tokenizer=tok,
        controlnets={
            "sam": (cn_cfg, CN.init_controlnet(ks[3], cn_cfg, jnp.float32)),
            "inpaint": (cn_cfg, CN.init_controlnet(ks[4], cn_cfg,
                                                   jnp.float32))},
        dtype=jnp.float32,
        schedule=make_schedule(prediction_type=prediction_type))


@pytest.fixture(scope="module")
def sd21():
    return tiny_sd21_bundle()


def _img(seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)


def _mask():
    m = np.zeros((64, 64), np.uint8)
    m[16:48, 16:48] = 255
    return m


def _edit(bundle, **kw):
    pipe = EditPipeline(bundle, controls=("sam", "inpaint"),
                        inpaint_mode=kw.pop("inpaint_mode", "blend"))
    base = dict(image=_img(), mask=_mask(), prompt="a photo of a cat",
                condition_image=_img(1), num_samples=1,
                image_resolution=64, num_steps=3, seed=5)
    base.update(kw)
    return pipe(**base)


class TestSD21Engine:
    def test_vpred_schedule_rides_the_bundle(self, sd21):
        """The SAME bundle with eps vs v schedules must produce different
        images — proof the pipelines consume bundle.schedule rather than
        the old hardcoded SD1.5 eps default."""
        out_v = _edit(sd21)
        eps = dataclasses.replace(
            sd21, schedule=make_schedule(prediction_type="epsilon"))
        out_e = _edit(eps)
        assert out_v.shape == out_e.shape == (1, 64, 64, 3)
        assert np.abs(out_v.astype(np.int32)
                      - out_e.astype(np.int32)).max() > 3

    @pytest.mark.parametrize("sampler", ["unipc", "ddim", "plms", "dpm"])
    def test_all_samplers_vpred(self, sd21, sampler):
        out = _edit(sd21, sampler=sampler)
        assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8

    def test_inpaint_modes_vpred(self, sd21):
        blend = _edit(sd21, alignment_ratio=0.7)
        mix = _edit(sd21, inpaint_mode="mix", alpha_weight=0.4)
        assert blend.shape == mix.shape == (1, 64, 64, 3)
        # 9-channel inpainting UNet variant
        ucfg9 = dataclasses.replace(sd21.unet_cfg, in_channels=9)
        b9 = dataclasses.replace(
            sd21, unet_cfg=ucfg9,
            unet=U.init_unet(jax.random.PRNGKey(9), ucfg9, jnp.float32))
        out9 = _edit(b9, inpaint_mode="unet9")
        assert out9.shape == (1, 64, 64, 3)

    def test_ref_control_vpred(self, sd21):
        ref = _img(7)[:, ::-1]
        rm = np.zeros((64, 64), np.uint8)
        rm[8:56, 8:56] = 255
        out = _edit(sd21, ref_image=ref, ref_mask=rm,
                    ref_prompt="a blue cat", reference_attn=True,
                    reference_adain=True, style_fidelity=0.5, ref_scale=0.3)
        assert out.shape == (1, 64, 64, 3)

    def test_generate_vpred(self, sd21):
        pipe = GenerationPipeline(sd21, controlnet="sam")
        out = pipe(prompt="a house", condition_image=_img(2),
                   num_samples=2, image_resolution=64, num_steps=3, seed=1)
        assert out.shape == (2, 64, 64, 3)

    def test_train_step_vpred_from_yaml_schedule(self, sd21, tmp_path):
        """make_train_step with the v schedule: the v target differs from
        eps, so gradients/losses differ on identical inputs."""
        from editanything_tpu.train import init_train_state, make_train_step
        from editanything_tpu.train.controlnet_train import make_optimizer
        cn_cfg, cn_params = sd21.controlnets["sam"]
        opt = make_optimizer(1e-3)
        batch = {"latents": jax.random.normal(jax.random.PRNGKey(0),
                                              (2, 8, 8, 4)),
                 "hint": jax.random.uniform(jax.random.PRNGKey(1),
                                            (2, 64, 64, 3)),
                 "context": jax.random.normal(jax.random.PRNGKey(2),
                                              (2, 5, 48))}
        losses = {}
        for pt in ("epsilon", "v_prediction"):
            step = jax.jit(make_train_step(
                cn_cfg, make_schedule(prediction_type=pt), opt))
            st = init_train_state(cn_params, opt)
            _, m = step(st, sd21.unet, batch, jax.random.PRNGKey(3))
            losses[pt] = float(m["loss"])
        assert abs(losses["epsilon"] - losses["v_prediction"]) > 1e-4

    def test_sd21_scale_config_from_yaml(self, tmp_path):
        """configs_from_cldm_yaml on the reference's actual cldm_v21.yaml
        geometry yields the SD2.1 architecture + v schedule."""
        yaml_text = """
model:
  params:
    linear_start: 0.00085
    linear_end: 0.012
    parameterization: v
    unet_config:
      params:
        in_channels: 4
        model_channels: 320
        channel_mult: [1, 2, 4, 4]
        num_res_blocks: 2
        context_dim: 1024
        num_head_channels: 64
        use_linear_in_transformer: true
    first_stage_config:
      params:
        ddconfig: {z_channels: 4, ch: 128, ch_mult: [1, 2, 4, 4],
                   num_res_blocks: 2}
    cond_stage_config:
      target: ldm.modules.encoders.modules.FrozenOpenCLIPEmbedder
"""
        p = tmp_path / "cldm_v21.yaml"
        p.write_text(yaml_text)
        from editanything_tpu.checkpoints.legacy import configs_from_cldm_yaml
        cfgs = configs_from_cldm_yaml(str(p))
        assert cfgs["unet"].block_out_channels == (320, 640, 1280, 1280)
        assert cfgs["unet"].attention_head_dim == (5, 10, 20, 20)
        assert cfgs["unet"].use_linear_projection
        assert cfgs["unet"].cross_attention_dim == 1024
        assert cfgs["text"].num_layers == 23
        assert cfgs["text"].hidden_size == 1024
        assert cfgs["schedule"].prediction_type == "v_prediction"
