"""Detector checkpoint converters (VLPart / GroundingDINO).

VLPart ships a detectron2-layout checkpoint (swinbase_part_0a0000.pth,
loaded at /root/reference/vlpart/vlpart.py:46-49). The mapping below
covers every module our models/vlpart.py re-implements:

  backbone.bottom_up.*                      -> backbone.* (swin naming)
  backbone.fpn_lateral{2..5} / fpn_output*  -> fpn.lateral/output.{0..3}
  proposal_generator.rpn_head.{conv, objectness_logits, anchor_deltas}
                                            -> rpn.*
  roi_heads.box_head.{k}.{fc1, fc2}         -> roi_heads.{k}.fc1/fc2
  roi_heads.box_predictor.{k}.bbox_pred.{0,2} -> roi_heads.{k}.bbox_pred
  roi_heads.box_predictor.{k}.cls_score.linear -> roi_heads.{k}.cls_score
  text_encoder.* (open_clip CLIP-RN50 text tower)
      token_embedding / positional_embedding / ln_final / text_projection
      transformer.resblocks.N.{attn.in_proj_*, attn.out_proj, ln_1, ln_2,
                               mlp.c_fc, mlp.c_proj}
                                            -> text_encoder.clip.* with the
      fused in_proj split into q/k/v (models/clip_text.py naming)

GroundingDINO import is NOT provided yet: the reference consumes the
external package whose BiAttentionBlock/encoder internals (value gates,
droppath, per-proj GroupNorms) differ from the simplified fusion blocks in
models/groundingdino.py — a weight-compatible variant is a follow-up.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from editanything_tpu.checkpoints.convert import (state_dict_to_tree,
                                                  swin_to_tree)


def _clip_rn50_text_remap(sd: Mapping[str, np.ndarray]
                          ) -> Dict[str, np.ndarray]:
    """open_clip text-tower keys -> HF-style clip_text keys + projection."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        a = np.asarray(v)
        if k == "token_embedding.weight":
            out["clip.embeddings.token_embedding.weight"] = a
        elif k == "positional_embedding":
            out["clip.embeddings.position_embedding.weight"] = a
        elif k == "ln_final.weight":
            out["clip.final_layer_norm.weight"] = a
        elif k == "ln_final.bias":
            out["clip.final_layer_norm.bias"] = a
        elif k == "text_projection":
            out["text_projection"] = a           # (D, zs_dim), kept as-is
        elif ".attn.in_proj_weight" in k:
            n = k.split(".resblocks.")[1].split(".")[0]
            d = a.shape[0] // 3
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                out[f"clip.encoder.layers.{n}.self_attn.{name}.weight"] = \
                    a[i * d:(i + 1) * d]
        elif ".attn.in_proj_bias" in k:
            n = k.split(".resblocks.")[1].split(".")[0]
            d = a.shape[0] // 3
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                out[f"clip.encoder.layers.{n}.self_attn.{name}.bias"] = \
                    a[i * d:(i + 1) * d]
        else:
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)", k)
            if not m:
                continue
            n, rest = m.groups()
            rest = (rest
                    .replace("attn.out_proj", "self_attn.out_proj")
                    .replace("ln_1", "layer_norm1")
                    .replace("ln_2", "layer_norm2")
                    .replace("mlp.c_fc", "mlp.fc1")
                    .replace("mlp.c_proj", "mlp.fc2"))
            out[f"clip.encoder.layers.{n}.{rest}"] = a
    return out


def vlpart_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """detectron2 VLPart checkpoint -> models/vlpart.py tree."""
    backbone_sd, fpn_sd, rest = {}, {}, {}
    text_sd = {}
    for k, v in sd.items():
        if k.startswith("backbone.bottom_up."):
            backbone_sd[k[len("backbone.bottom_up."):]] = v
        elif k.startswith("backbone.fpn_"):
            fpn_sd[k[len("backbone."):]] = v
        elif k.startswith("text_encoder."):
            text_sd[k[len("text_encoder."):]] = v
        elif k.startswith(("proposal_generator.", "roi_heads.")):
            rest[k] = v
        # pixel_mean/std buffers dropped (constants in models/vlpart.py)

    tree = {"backbone": swin_to_tree(backbone_sd, dtype=dtype)}

    # FPN: fpn_lateral2 -> lateral.0 etc.
    remapped = {}
    for k, v in fpn_sd.items():
        m = re.match(r"fpn_(lateral|output)(\d)\.(weight|bias)", k)
        if m:
            kind, lvl, leaf = m.groups()
            remapped[f"{kind}.{int(lvl) - 2}.{leaf}"] = v
    tree["fpn"] = state_dict_to_tree(remapped, dtype=dtype)

    # RPN + cascade heads
    remapped = {}
    for k, v in rest.items():
        nk = k
        nk = nk.replace("proposal_generator.rpn_head.", "rpn.")
        nk = re.sub(r"roi_heads\.box_head\.(\d)\.", r"roi_heads.\1.", nk)
        nk = re.sub(r"roi_heads\.box_predictor\.(\d)\.cls_score\.linear\.",
                    r"roi_heads.\1.cls_score.", nk)
        nk = re.sub(r"roi_heads\.box_predictor\.(\d)\.bbox_pred\.",
                    r"roi_heads.\1.bbox_pred.", nk)
        remapped[nk] = v
    heads = state_dict_to_tree(remapped, dtype=dtype)
    tree.update(heads)

    tree["text_encoder"] = state_dict_to_tree(
        _clip_rn50_text_remap(text_sd), norm_weight_name="scale",
        embedding_modules=("token_embedding", "position_embedding",
                           "text_projection"), dtype=dtype)
    te = tree["text_encoder"]
    if isinstance(te.get("text_projection"), dict):
        te["text_projection"] = next(iter(te["text_projection"].values()))
    return tree
