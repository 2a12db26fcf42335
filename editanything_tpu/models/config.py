"""Typed model configurations (one config system for the whole framework).

Replaces the reference's heterogeneous config sprawl — OmegaConf YAML +
`instantiate_from_config` (/root/reference/ldm/util.py:72-87,
models/cldm_v21.yaml), argparse scripts, and module-level constants
(SURVEY.md section 5 "Config / flag system").
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """diffusers-layout UNet2DCondition architecture description.

    SD1.5 defaults. The reference's UNet lives at
    /root/reference/ldm/modules/diffusionmodules/openaimodel.py:412 (legacy
    layout) and is consumed through diffusers pipelines (utils/*.py).
    """
    in_channels: int = 4                 # 9 for the inpainting UNet
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768       # 1024 for SD2.1
    attention_head_dim: Tuple[int, ...] = (8, 8, 8, 8)   # heads per block (SD1.5)
    # SD2.x uses per-block head counts (5, 10, 20, 20) with 64-dim heads and
    # linear (not conv) projections in the transformer blocks.
    use_linear_projection: bool = False
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D")
    norm_num_groups: int = 32
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def heads_for_block(self, block_index: int) -> int:
        return self.attention_head_dim[block_index]


def sd15_unet() -> UNetConfig:
    return UNetConfig()


def sd15_inpaint_unet() -> UNetConfig:
    return dataclasses.replace(sd15_unet(), in_channels=9)


def sd21_unet() -> UNetConfig:
    """SD2.1 (cldm_v21.yaml:15-46: 320ch, mult 1/2/4/4, context 1024,
    head_dim 64 => heads 5/10/20/20, linear projections)."""
    return UNetConfig(
        cross_attention_dim=1024,
        attention_head_dim=(5, 10, 20, 20),
        use_linear_projection=True,
    )


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    """ControlNet = UNet encoder copy + hint embedding + zero convs
    (behavioral spec: /root/reference/cldm/cldm.py:48-305 and the diffusers
    fork utils/stable_diffusion_controlnet.py:665-815)."""
    unet: UNetConfig = dataclasses.field(default_factory=sd15_unet)
    conditioning_channels: int = 3
    conditioning_embedding_channels: Tuple[int, ...] = (16, 32, 96, 256)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL (reference: /root/reference/ldm/models/autoencoder.py:13,
    ldm/modules/diffusionmodules/model.py Encoder/Decoder; z=4,
    scale 0.18215 per cldm_v21.yaml:63-84)."""
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text tower. ViT-L/14 (SD1.5) defaults; `openclip_h` gives the
    SD2.1 encoder (penultimate layer, gelu — cldm_v21.yaml:82-85,
    /root/reference/ldm/modules/encoders/modules.py:134-193)."""
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"      # "gelu" for OpenCLIP-H
    # which hidden state feeds the UNet: 0 = final, 1 = penultimate, ...
    layer_skip: int = 0
    eos_token_id: int = 49407

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def clip_vit_l() -> CLIPTextConfig:
    return CLIPTextConfig()


def openclip_vit_h() -> CLIPTextConfig:
    return CLIPTextConfig(
        hidden_size=1024, intermediate_size=4096, num_layers=23,
        num_heads=16, hidden_act="gelu", layer_skip=0,
    )
    # note: OpenCLIP-H has 24 layers; SD2.x uses the penultimate output,
    # equivalently a 23-layer stack with final_layer_norm applied — we keep
    # 23 materialized layers so layer_skip stays 0 and no dead weights ride
    # along.
