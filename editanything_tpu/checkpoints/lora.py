"""kohya-format LoRA merging into diffusers-layout param trees.

Behavioral spec: /root/reference/editany_lora.py:197-329
(`load_lora_weights`): .safetensors entries named
`lora_unet_<module>_<path>.lora_{up,down}.weight` (+ `.alpha`), merged as
W += multiplier * (alpha / rank) * (up @ down); `lora_te_*` targets the text
encoder. Supports lists of LoRA files applied sequentially (e.g. the
"beauty" demo's cuteGirlMix4 at weight 0.5, app.py:41-52).

Merging happens on the JAX tree: up/down stay tiny host arrays; the update
is one einsum per target tensor, so applying a LoRA is milliseconds and
needs no pipeline rebuild (the reference rebuilds whole diffusers pipelines,
editany_lora.py:659-703).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import jax.numpy as jnp
import numpy as np


def _kohya_groups(sd: Mapping[str, np.ndarray]):
    """Group flat kohya keys -> {target: {up, down, alpha}}."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if ".lora_up.weight" in k:
            tgt, part = k.split(".lora_up.weight")[0], "up"
        elif ".lora_down.weight" in k:
            tgt, part = k.split(".lora_down.weight")[0], "down"
        elif k.endswith(".alpha"):
            tgt, part = k[: -len(".alpha")], "alpha"
        else:
            continue
        groups.setdefault(tgt, {})[part] = np.asarray(v)
    return groups


def _target_to_path(tgt: str) -> Tuple[str, List[str]]:
    """kohya target name -> (model, tree path).

    `lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q`
    -> ("unet", [down_blocks, 0, attentions, 0, transformer_blocks, 0,
        attn1, to_q]). Kohya flattens module dots to underscores; we re-split
    on underscores, merging numeric segments as their own path element and
    gluing known multi-word module names back together.
    """
    if tgt.startswith("lora_unet_"):
        model, rest = "unet", tgt[len("lora_unet_"):]
    elif tgt.startswith("lora_te_"):
        model, rest = "text_encoder", tgt[len("lora_te_"):]
    else:
        raise ValueError(f"unknown lora target {tgt!r}")

    known = [
        "down_blocks", "up_blocks", "mid_block", "transformer_blocks",
        "attentions", "resnets", "proj_in", "proj_out", "to_q", "to_k",
        "to_v", "to_out", "ff_net", "time_emb_proj", "conv_shortcut",
        "conv_in", "conv_out", "conv1", "conv2", "text_model",
        "encoder_layers", "self_attn", "q_proj", "k_proj", "v_proj",
        "out_proj", "mlp_fc1", "mlp_fc2", "layers",
    ]
    # longest-first greedy re-tokenization
    known.sort(key=len, reverse=True)
    path: List[str] = []
    rest_parts = rest.split("_")
    i = 0
    while i < len(rest_parts):
        matched = False
        for name in known:
            toks = name.split("_")
            if rest_parts[i:i + len(toks)] == toks:
                # expand aliases that flatten nested paths
                if name == "ff_net":
                    path += ["ff", "net"]
                elif name == "encoder_layers":
                    path += ["encoder", "layers"]
                elif name == "mlp_fc1":
                    path += ["mlp", "fc1"]
                elif name == "mlp_fc2":
                    path += ["mlp", "fc2"]
                else:
                    path.append(name)
                i += len(toks)
                matched = True
                break
        if not matched:
            path.append(rest_parts[i])
            i += 1
    # kohya's to_out maps to diffusers to_out.0
    if path and path[-1] == "to_out":
        path.append("0")
    return model, path


def _get_path(tree, path):
    node = tree
    for k in path:
        if k not in node:
            return None
        node = node[k]
    return node


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def merge_kohya_lora(trees: Dict[str, dict], sd: Mapping[str, np.ndarray],
                     multiplier: float = 1.0) -> Dict[str, int]:
    """Merge one LoRA state dict into {"unet": tree, "text_encoder": tree}.

    Mutates the trees in place (functional callers pass copies). Returns
    {"merged": n, "skipped": n} counts.
    """
    merged = skipped = 0
    for tgt, grp in _kohya_groups(sd).items():
        if "up" not in grp or "down" not in grp:
            skipped += 1
            continue
        model, path = _target_to_path(tgt)
        tree = trees.get(model)
        if tree is None:
            skipped += 1
            continue
        node = _get_path(tree, path)
        if node is None and path and path[0] == "text_model":
            # kohya lora_te_* keys keep the HF text_model. prefix that
            # clip_text_to_tree strips (convert.py:138)
            node = _get_path(tree, path[1:])
        if node is None or "kernel" not in node:
            skipped += 1
            continue

        up = grp["up"].astype(np.float32)
        down = grp["down"].astype(np.float32)
        rank = down.shape[0]
        alpha = float(grp.get("alpha", rank))
        scale = multiplier * alpha / rank

        kernel = node["kernel"]
        if kernel.ndim == 2:
            # torch delta W (out, in) = up @ down; ours is (in, out)
            delta = (up[:, :, 0, 0] if up.ndim == 4 else up) @ \
                    (down[:, :, 0, 0] if down.ndim == 4 else down)
            node["kernel"] = (kernel + scale * jnp.asarray(delta.T,
                                                           kernel.dtype))
        elif kernel.ndim == 4:
            # conv lora: up (out, r, 1, 1), down (r, in, kh, kw)
            u = up.reshape(up.shape[0], up.shape[1])
            d = down.reshape(down.shape[0], -1)
            delta = (u @ d).reshape(up.shape[0], down.shape[1],
                                    down.shape[2], down.shape[3])
            delta_hwio = delta.transpose(2, 3, 1, 0)
            node["kernel"] = (kernel + scale * jnp.asarray(delta_hwio,
                                                           kernel.dtype))
        else:
            skipped += 1
            continue
        merged += 1
    return {"merged": merged, "skipped": skipped}


def load_ti_file(path: str) -> np.ndarray:
    """Load a textual-inversion embedding file -> (N, D) float32.

    Formats: .npy (this package's trainer), torch .bin/.pt dicts — both the
    diffusers {placeholder: (N, D)} layout the reference saves
    (utils/texutal_inversion.py:160-168 save_progress, loaded at
    editany_lora.py:734) and the A1111 {"string_to_param": {"*": ...}}
    layout — and single-tensor .safetensors."""
    if path.endswith(".npy"):
        arr = np.load(path)
    elif path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        tensors = load_file(path)
        arr = next(iter(tensors.values()))
    else:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "string_to_param" in obj:
            obj = next(iter(obj["string_to_param"].values()))
        elif isinstance(obj, dict):
            obj = next(v for v in obj.values()
                       if hasattr(v, "ndim") or isinstance(v, np.ndarray))
        arr = obj.detach().float().numpy() if hasattr(obj, "detach") \
            else np.asarray(obj)
    arr = np.asarray(arr, np.float32)
    return arr[None] if arr.ndim == 1 else arr


def load_textual_inversion(clip_tree: dict, embedding: np.ndarray,
                           token_ids: List[int]):
    """Write learned TI vectors into token-embedding rows (the reference's
    `pipe.load_textual_inversion`, editany_lora.py:734)."""
    table = clip_tree["embeddings"]["token_embedding"]["weight"]
    emb = jnp.asarray(embedding, table.dtype)
    table = table.at[jnp.asarray(token_ids)].set(emb)
    clip_tree["embeddings"]["token_embedding"]["weight"] = table
    return clip_tree
