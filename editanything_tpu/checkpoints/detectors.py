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

GroundingDINO (`dino_to_tree`) imports the official
`groundingdino_swint_ogc.pth` layout (the checkpoint the reference loads
via utils/GroundingDINO_SwinT_OGC.py + sam2groundingdino_edit.py:64-75):

  backbone.0.*                 -> backbone.* (swin, via swin_to_tree)
  bert.*                       -> bert.* (via bert_to_tree; pooler dropped)
  feat_map / input_proj.{i}.{0,1} -> feat_map / input_proj.{i}.{conv,norm}
  transformer.encoder.layers.N.self_attn.{sampling_offsets,...} etc.
                               -> same paths, mechanical
  nn.MultiheadAttention packed in_proj_{weight,bias} (text_layers
  self_attn, decoder self_attn / ca_text) -> split q/k/v + out_proj -> o
  bbox_embed.0.* (shared across the 6 decoder copies) -> bbox_embed.*;
  bbox_embed.{1..5}.* and transformer.decoder.bbox_embed.* skipped (the
  official model ties them to the same module)
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from editanything_tpu.checkpoints.convert import (bert_to_tree,
                                                  state_dict_to_tree,
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


# ---------------------------------------------------------------------------
# GroundingDINO
# ---------------------------------------------------------------------------

_DINO_SKIP = re.compile(
    r"^(transformer\.decoder\.bbox_embed\.|bbox_embed\.[1-5]\.|label_enc"
    r"|bert\.pooler|backbone\.1)")


def _split_packed_mha(out: Dict[str, np.ndarray], key: str, v: np.ndarray):
    """nn.MultiheadAttention in_proj_{weight,bias} -> q/k/v leaves."""
    base, leaf = key.rsplit(".", 1)
    a = np.asarray(v)
    d = a.shape[0] // 3
    suffix = "weight" if leaf == "in_proj_weight" else "bias"
    for i, name in enumerate("qkv"):
        out[f"{base}.{name}.{suffix}"] = a[i * d:(i + 1) * d]


def dino_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """Official groundingdino_swint_ogc.pth -> models/groundingdino.py tree."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    swin_sd, bert_sd, rest = {}, {}, {}
    for k, v in sd.items():
        if _DINO_SKIP.match(k):
            continue
        if k.startswith("backbone.0."):
            swin_sd[k[len("backbone.0."):]] = v
        elif k.startswith("bert."):
            bert_sd[k] = v
        else:
            rest[k] = v

    remapped: Dict[str, np.ndarray] = {}
    for k, v in rest.items():
        nk = k
        nk = re.sub(r"^bbox_embed\.0\.", "bbox_embed.", nk)
        m = re.match(r"^input_proj\.(\d+)\.([01])\.(weight|bias)$", nk)
        if m:
            i, sub, leaf = m.groups()
            nk = f"input_proj.{i}.{'conv' if sub == '0' else 'norm'}.{leaf}"
        if nk.endswith((".in_proj_weight", ".in_proj_bias")):
            _split_packed_mha(remapped, nk, v)
            continue
        nk = nk.replace(".out_proj.", ".o.")
        remapped[nk] = v

    tree = state_dict_to_tree(remapped, norm_weight_name="scale",
                              embedding_modules=("tgt_embed",), dtype=dtype)
    tree["backbone"] = swin_to_tree(swin_sd, dtype=dtype)
    tree["bert"] = bert_to_tree(bert_sd, dtype=dtype)
    return tree
