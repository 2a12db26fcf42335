"""torch / diffusers / safetensors checkpoint import.

The reference consumes weights in several formats (SURVEY.md section 5
"Checkpoint / resume"): diffusers model repos (UNet/VAE/CLIP/ControlNet),
SAM `.pth` (editany_lora.py:58-68), kohya-naming LoRA `.safetensors`
(:197-329), textual-inversion embeddings (:734), and legacy ldm `.ckpt`
(cldm/model.py:12-21). This module imports all of them into our param
trees.

Because our trees are *named after* the torch modules (models/*.py), the
conversion is purely mechanical:
  - `foo.bar.weight` -> tree path foo/bar + layout transform by tensor rank:
      conv OIHW -> HWIO, linear (out,in) -> (in,out), convT (I,O,H,W) ->
      (H,W,I,O), vectors unchanged
  - norm `weight` -> "scale" for LayerNorm/GroupNorm params; SAM's
    LayerNorm2d keeps torch naming ("weight"/"bias") by design.

No torch import is needed at inference time — torch is only used here to
read `.pth`/`.ckpt` files (safetensors are read natively).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors / .pt / .pth / .ckpt file to numpy arrays."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        # lightning .ckpt layout (cldm/model.py:12-21)
        obj = obj["state_dict"]
    elif isinstance(obj, dict) and isinstance(obj.get("model"), dict):
        # detectron2 (VLPart swinbase_part_0a0000.pth) and DETR-family
        # (groundingdino_swint_ogc.pth) wrap weights under "model"
        obj = obj["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()
            if hasattr(v, "numpy")
            or isinstance(v, (np.ndarray, int, float))}


# ---------------------------------------------------------------------------
# Layout transforms
# ---------------------------------------------------------------------------

def _to_jax_layout(name: str, arr: np.ndarray, *, transpose_linear=True):
    if name.endswith(".weight") and arr.ndim == 4:
        # conv OIHW -> HWIO
        return arr.transpose(2, 3, 1, 0)
    if name.endswith(".weight") and arr.ndim == 2 and transpose_linear:
        return arr.T
    return arr


_NORM_PAT = re.compile(
    r"(norm|layer_norm|layernorm|group_norm|ln_)[\w]*$|^norm")


def _is_norm_module(mod_path: str) -> bool:
    last = mod_path.split(".")[-1]
    return bool(_NORM_PAT.search(last))


def _set_path(tree: dict, keys, value):
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def state_dict_to_tree(sd: Mapping[str, np.ndarray], *,
                       norm_weight_name: str = "scale",
                       embedding_modules=(),
                       conv_transpose_modules=(),
                       dtype=None) -> dict:
    """Generic torch state-dict -> nested JAX tree with layout transforms.

    norm params: `weight` renamed to `norm_weight_name`; embedding modules
    keep their (V, D) layout and `weight` name; conv-transpose modules get
    the (I, O, H, W) -> (H, W, I, O) permute.
    """
    tree: dict = {}
    for name, arr in sd.items():
        parts = name.split(".")
        mod_path = ".".join(parts[:-1])
        leaf = parts[-1]
        a = np.asarray(arr)

        is_emb = any(mod_path.endswith(m) or m in mod_path
                     for m in embedding_modules)
        is_convt = any(mod_path.endswith(m) for m in conv_transpose_modules)

        if leaf == "weight":
            if is_emb:
                out_leaf, out = "weight", a
            elif is_convt and a.ndim == 4:
                out_leaf, out = "kernel", a.transpose(2, 3, 0, 1)
            elif a.ndim == 4:
                out_leaf, out = "kernel", a.transpose(2, 3, 1, 0)
            elif a.ndim == 2:
                out_leaf, out = "kernel", a.T
            elif a.ndim == 1:
                out_leaf, out = (norm_weight_name, a)
            else:
                out_leaf, out = "weight", a
        elif leaf == "bias":
            out_leaf, out = "bias", a
        else:
            out_leaf, out = leaf, a

        if dtype is not None and np.issubdtype(out.dtype, np.floating):
            out = out.astype(dtype)
        _set_path(tree, parts[:-1] + [out_leaf], jnp.asarray(out))
    return tree


# ---------------------------------------------------------------------------
# Model-specific entry points
# ---------------------------------------------------------------------------

def diffusers_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """diffusers UNet2DConditionModel / ControlNetModel / AutoencoderKL
    state dict -> our tree (models/unet.py, controlnet.py, vae.py naming)."""
    return state_dict_to_tree(
        sd, norm_weight_name="scale",
        conv_transpose_modules=(),
        dtype=dtype)


def clip_text_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """HF CLIPTextModel state dict (text_model.* prefix stripped)."""
    stripped = {}
    for k, v in sd.items():
        k = k.replace("text_model.", "")
        if k.startswith("embeddings.position_ids"):
            continue
        stripped[k] = v
    return state_dict_to_tree(
        stripped, norm_weight_name="scale",
        embedding_modules=("token_embedding", "position_embedding"),
        dtype=dtype)


def safety_checker_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """StableDiffusionSafetyChecker state dict
    (CompVis/stable-diffusion-safety-checker) -> models/safety.py tree:
    vision_model.* CLIP tower + visual_projection + concept/special-care
    embeds and thresholds (all bare buffers).

    The HF class nests a CLIPVisionModel under an attribute that is ALSO
    named vision_model, so real checkpoint keys are doubled
    (vision_model.vision_model.embeddings...); strip one level so the tree
    matches models/safety.py's single vision_model prefix."""
    stripped = {
        k.replace("vision_model.vision_model.", "vision_model.", 1): v
        for k, v in sd.items() if not k.endswith("position_ids")}
    return state_dict_to_tree(
        stripped, norm_weight_name="scale",
        embedding_modules=("position_embedding",),
        dtype=dtype)


def sam_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """Official SAM checkpoint (sam_vit_*.pth) -> models/sam.py tree.

    SAM's LayerNorm2d modules (neck.1/3, mask_downscaling.1/4,
    output_upscaling.1) keep `weight`; the transposed convs in
    output_upscaling (0, 3) need the (I, O, H, W) permute; pos_embed and
    rel_pos_* are bare arrays.
    """
    tree = state_dict_to_tree(
        sd, norm_weight_name="scale",
        embedding_modules=("point_embeddings", "not_a_point_embed",
                           "no_mask_embed", "iou_token", "mask_tokens",
                           "token_embedding", "position_embedding"),
        conv_transpose_modules=("output_upscaling.0", "output_upscaling.3"),
        dtype=dtype)

    # LayerNorm2d + bare-tensor fixups: rename scale->weight where our SAM
    # code expects torch naming, and unwrap scalar-param dicts.
    def fix(node, path):
        if isinstance(node, dict):
            if set(node) <= {"scale", "bias"} and "scale" in node and (
                    "neck" in path or "output_upscaling" in path
                    or "mask_downscaling" in path):
                node["weight"] = node.pop("scale")
            for k, v in list(node.items()):
                fix(v, path + [k])
    if "image_encoder" in tree:
        fix(tree["image_encoder"], ["image_encoder"])
    if "mask_decoder" in tree:
        fix(tree["mask_decoder"], ["mask_decoder"])
    if "prompt_encoder" in tree:
        fix(tree["prompt_encoder"], ["prompt_encoder"])

    # pos_embed arrives as {"pos_embed": array} at module level already;
    # blocks' norm weights use "scale" which matches core layer_norm.
    return tree


def swin_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """torch Swin checkpoint (timm / detectron2 bottom_up naming, e.g.
    swin_base_patch4_window7_224_22k.pth) -> models/swin.py tree.

    Our tree mirrors torch module names; the only special cases are the
    relative_position_bias_table ((2W-1)^2, H) kept untransposed, and the
    fused qkv linear."""
    sd = {k.replace("backbone.bottom_up.", "").replace("backbone.", ""): v
          for k, v in sd.items()
          if "relative_position_index" not in k
          and "attn_mask" not in k and not k.startswith("head.")}
    return state_dict_to_tree(
        sd, norm_weight_name="scale",
        embedding_modules=("relative_position_bias_table",
                           "absolute_pos_embed"),
        dtype=dtype)


_BLIP2_MAP = [
    # (torch regex, our replacement) — HF Blip2ForConditionalGeneration
    (r"^vision_model\.embeddings\.patch_embedding\.", "vision_model.patch_embed."),
    (r"^vision_model\.embeddings\.class_embedding$", "vision_model.cls_token"),
    (r"^vision_model\.embeddings\.position_embedding$", "vision_model.pos_embed"),
    (r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm1\.", r"vision_model.layers.\1.norm1."),
    (r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm2\.", r"vision_model.layers.\1.norm2."),
    (r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.projection\.", r"vision_model.layers.\1.attn.o."),
    (r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.", r"vision_model.layers.\1.mlp.fc1."),
    (r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.", r"vision_model.layers.\1.mlp.fc2."),
    (r"^vision_model\.post_layernorm\.", "vision_model.post_layernorm."),
    (r"^query_tokens$", "qformer.query_tokens"),
    (r"^qformer\.layernorm\.", "qformer.layernorm."),
    (r"^qformer\.encoder\.layer\.(\d+)\.attention\.attention\.query\.", r"qformer.layers.\1.attention.q."),
    (r"^qformer\.encoder\.layer\.(\d+)\.attention\.attention\.key\.", r"qformer.layers.\1.attention.k."),
    (r"^qformer\.encoder\.layer\.(\d+)\.attention\.attention\.value\.", r"qformer.layers.\1.attention.v."),
    (r"^qformer\.encoder\.layer\.(\d+)\.attention\.output\.dense\.", r"qformer.layers.\1.attention.o."),
    (r"^qformer\.encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.", r"qformer.layers.\1.attention_norm."),
    (r"^qformer\.encoder\.layer\.(\d+)\.crossattention\.attention\.query\.", r"qformer.layers.\1.crossattention.q."),
    (r"^qformer\.encoder\.layer\.(\d+)\.crossattention\.attention\.key\.", r"qformer.layers.\1.crossattention.k."),
    (r"^qformer\.encoder\.layer\.(\d+)\.crossattention\.attention\.value\.", r"qformer.layers.\1.crossattention.v."),
    (r"^qformer\.encoder\.layer\.(\d+)\.crossattention\.output\.dense\.", r"qformer.layers.\1.crossattention.o."),
    (r"^qformer\.encoder\.layer\.(\d+)\.crossattention\.output\.LayerNorm\.", r"qformer.layers.\1.crossattention_norm."),
    (r"^qformer\.encoder\.layer\.(\d+)\.intermediate_query\.dense\.", r"qformer.layers.\1.ffn.fc1."),
    (r"^qformer\.encoder\.layer\.(\d+)\.output_query\.dense\.", r"qformer.layers.\1.ffn.fc2."),
    (r"^qformer\.encoder\.layer\.(\d+)\.output_query\.LayerNorm\.", r"qformer.layers.\1.ffn_norm."),
    (r"^language_projection\.", "language_projection."),
    (r"^language_model\.model\.decoder\.embed_tokens\.", "language_model.embed_tokens."),
    (r"^language_model\.model\.decoder\.embed_positions\.", "language_model.embed_positions."),
    (r"^language_model\.model\.decoder\.final_layer_norm\.", "language_model.final_layer_norm."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.self_attn\.q_proj\.", r"language_model.layers.\1.self_attn.q."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.self_attn\.k_proj\.", r"language_model.layers.\1.self_attn.k."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.self_attn\.v_proj\.", r"language_model.layers.\1.self_attn.v."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.self_attn\.out_proj\.", r"language_model.layers.\1.self_attn.o."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.self_attn_layer_norm\.", r"language_model.layers.\1.self_attn_layer_norm."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.final_layer_norm\.", r"language_model.layers.\1.final_layer_norm."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.fc1\.", r"language_model.layers.\1.fc1."),
    (r"^language_model\.model\.decoder\.layers\.(\d+)\.fc2\.", r"language_model.layers.\1.fc2."),
]


def blip2_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """HF Blip2ForConditionalGeneration state dict -> models/blip2.py tree.

    The EVA vision tower's fused qkv is split into q/k/v; HF stores q/v
    biases separately (k bias is zero in EVA)."""
    remapped: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if "vision_model" in k and ".self_attn.qkv." in k:
            # split the fused qkv into our q/k/v leaves
            layer = k.split(".layers.")[1].split(".")[0]
            leaf = k.rsplit(".", 1)[-1]
            a = np.asarray(v)
            d = a.shape[0] // 3
            for i, name in enumerate("qkv"):
                remapped[f"vision_model.layers.{layer}.attn.{name}.{leaf}"] \
                    = a[i * d:(i + 1) * d]
            continue
        nk = k
        for pat, rep in _BLIP2_MAP:
            nk2 = re.sub(pat, rep, nk)
            if nk2 != nk:
                nk = nk2
                break
        remapped[nk] = v
    tree = state_dict_to_tree(
        remapped, norm_weight_name="scale",
        embedding_modules=("embed_tokens", "embed_positions", "cls_token",
                           "pos_embed", "query_tokens"),
        dtype=dtype)
    # bare parameters (no trailing .weight) end up as leaf dicts; flatten
    for name in ("cls_token", "pos_embed"):
        node = tree.get("vision_model", {})
        if isinstance(node.get(name), dict) and len(node[name]) == 1:
            node[name] = next(iter(node[name].values()))
    return tree


def bert_to_tree(sd: Mapping[str, np.ndarray], dtype=None) -> dict:
    """HF bert-base-uncased state dict -> groundingdino.init_bert tree."""
    mapping = [
        (r"^bert\.", ""),
        (r"^embeddings\.word_embeddings\.weight$", "embeddings.word"),
        (r"^embeddings\.position_embeddings\.weight$", "embeddings.position"),
        (r"^embeddings\.token_type_embeddings\.weight$",
         "embeddings.token_type"),
        (r"^embeddings\.LayerNorm\.", "embeddings.norm."),
        (r"^encoder\.layer\.(\d+)\.attention\.self\.query\.", r"layers.\1.attention.q."),
        (r"^encoder\.layer\.(\d+)\.attention\.self\.key\.", r"layers.\1.attention.k."),
        (r"^encoder\.layer\.(\d+)\.attention\.self\.value\.", r"layers.\1.attention.v."),
        (r"^encoder\.layer\.(\d+)\.attention\.output\.dense\.", r"layers.\1.attention.o."),
        (r"^encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.", r"layers.\1.attention.norm."),
        (r"^encoder\.layer\.(\d+)\.intermediate\.dense\.", r"layers.\1.mlp.fc1."),
        (r"^encoder\.layer\.(\d+)\.output\.dense\.", r"layers.\1.mlp.fc2."),
        (r"^encoder\.layer\.(\d+)\.output\.LayerNorm\.", r"layers.\1.mlp.norm."),
    ]
    remapped = {}
    for k, v in sd.items():
        if k.startswith("cls.") or "pooler" in k or "position_ids" in k:
            continue
        nk = k
        for pat, rep in mapping:
            nk = re.sub(pat, rep, nk)
        remapped[nk] = v
    tree = state_dict_to_tree(
        remapped, norm_weight_name="scale",
        embedding_modules=("embeddings.word", "embeddings.position",
                           "embeddings.token_type"),
        dtype=dtype)
    # bare embedding tables: unwrap {"weight": x}
    emb = tree.get("embeddings", {})
    for name in ("word", "position", "token_type"):
        if isinstance(emb.get(name), dict) and "weight" in emb[name]:
            emb[name] = emb[name]["weight"]
    return tree


def tree_to_diffusers(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse conversion (for checkpoint export / tests)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        a = np.asarray(node)
        leaf = path[-1]
        name = ".".join(path[:-1])
        if leaf == "kernel" and a.ndim == 4:
            out[f"{name}.weight"] = a.transpose(3, 2, 0, 1)
        elif leaf == "kernel" and a.ndim == 2:
            out[f"{name}.weight"] = a.T
        elif leaf == "scale":
            out[f"{name}.weight"] = a
        else:
            out[".".join(path)] = a

    walk(tree, [prefix] if prefix else [])
    return out
