"""Demo presets + semantic-label overlay rendering.

Behavioral spec:
- named ControlNet checkpoint registry: /root/reference/editany_lora.py:72-79
  (`config_dict` — the four released edit-anything ControlNets)
- beauty/handsome demos: editany_beauty.py / editany_handsome.py — the same
  template UI with a curated base model + LoRA and example prompt lists
- semantic overlay: sam2semantic.py:100-146 (`show_semantic_image_label`:
  random-color region fill + centered wrapped labels) — PIL text here
  instead of cv2.
"""

from __future__ import annotations

import textwrap
from collections import OrderedDict
from typing import Dict, List, Sequence, Tuple

import numpy as np

# Named ControlNet checkpoints (editany_lora.py:72-79). Values are HF repo
# ids; in this zero-egress deployment they resolve through local paths in
# the bundle spec.
CONFIG_DICT = OrderedDict([
    ("LAION Pretrained(v0-4)-SD15", "shgao/edit-anything-v0-4-sd15"),
    ("LAION Pretrained(v0-4)-SD21", "shgao/edit-anything-v0-4-sd21"),
    ("LAION Pretrained(v0-3)-SD21", "shgao/edit-anything-v0-3"),
    ("SAM Pretrained(v0-1)-SD21", "shgao/edit-anything-v0-1-1"),
])

# Curated demo presets (base model + LoRA + short example prompts standing
# in for the reference's long prompt lists)
DEMO_PRESETS = {
    "beauty": {
        "base_model": "chilloutmix_NiPrunedFp32Fix",
        "lora": ("cuteGirlMix4_v10.safetensors", 0.5),
        "examples": [
            ("1girl, beautiful face, solo, brown hair, best quality, "
             "masterpiece, photorealistic", 5),
            ("ultra high res, photorealistic, detailed beautiful girl, "
             "looking at viewer, smile", 8),
        ],
    },
    "handsome": {
        "base_model": "Realistic_Vision_V2.0",
        "lora": None,
        "examples": [
            ("1boy, handsome face, suit, best quality, masterpiece, "
             "photorealistic", 5),
        ],
    },
}


def build_combined_editors(bundles: Dict[str, "ModelBundle"], *,
                           sam=None, captioner=None,
                           lora_specs: Dict[str, Sequence] = None,
                           **editor_kw) -> "OrderedDict":
    """The combined app's model composition (/root/reference/app.py:15-76):
    one EditAnythingEditor per named tab ("Edit Anything", "Beauty", ...),
    all SHARING one SAM predictor/AMG and one BLIP2 captioner — the
    reference constructs both models once and passes them into each
    EditAnythingLoraModel. LoRA merging (the Beauty tab's cuteGirlMix4 at
    weight 0.5, app.py:41-52) happens per-bundle via lora_specs:
    {tab: [(lora_sd_or_path, multiplier), ...]}.

    Pair with apps.ui.create_combined_app(editors) for the two-tab UI."""
    from editanything_tpu.pipelines import EditAnythingEditor

    editors = OrderedDict()
    for name, bundle in bundles.items():
        for spec in (lora_specs or {}).get(name, ()):
            sd, mult = spec if isinstance(spec, (tuple, list)) else (spec, 1.0)
            if isinstance(sd, str):
                from editanything_tpu.checkpoints import \
                    load_torch_state_dict
                sd = load_torch_state_dict(sd)
            from editanything_tpu.checkpoints.lora import merge_kohya_lora
            merge_kohya_lora({"unet": bundle.unet,
                              "text_encoder": bundle.text}, sd,
                             multiplier=float(mult))
        editors[name] = EditAnythingEditor(bundle, sam=sam,
                                           captioner=captioner, **editor_kw)
    return editors


def show_semantic_image_label(
        image_hw: Tuple[int, int],
        regions: Sequence[Tuple[np.ndarray, str]],
        seed: int = 0) -> np.ndarray:
    """regions: [(mask (H, W) bool, label str)] -> (H, W, 3) uint8 overlay
    with random-color fills and centered wrapped labels."""
    from PIL import Image, ImageDraw
    rng = np.random.RandomState(seed)
    h, w = image_hw
    full = np.zeros((h, w, 3), np.float32)
    for mask, _ in regions:
        color = rng.random(3)
        full[np.asarray(mask) != 0] = color
    img = Image.fromarray((full * 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    for mask, label in regions:
        ys, xs = np.nonzero(np.asarray(mask))
        if len(ys) == 0:
            continue
        cx, cy = int(xs.mean()), int(ys.mean())
        lines = textwrap.wrap(label, width=20)
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        spacing = 14
        y0 = cy - (len(lines) - 1) * spacing // 2
        for i, line in enumerate(lines):
            tw = draw.textlength(line)
            draw.text((cx - tw / 2, y0 + i * spacing - 6), line,
                      fill=color)
    return np.asarray(img)


def semantic_overlay(image: np.ndarray, masks: np.ndarray,
                     valid: np.ndarray, labels: List[Tuple[int, str]],
                     *, mask_threshold: float = 0.0,
                     seed: int = 0) -> np.ndarray:
    """Convenience: AMG output slabs + (index, label) pairs -> overlay.
    Low-res mask logits are upscaled to the image size."""
    import jax
    import jax.numpy as jnp
    h, w = image.shape[:2]
    regions = []
    for idx, label in labels:
        if not valid[idx]:
            continue
        m = np.asarray(jax.image.resize(
            jnp.asarray(masks[idx], jnp.float32), (h, w),
            method="bilinear")) > mask_threshold
        regions.append((m, label))
    return show_semantic_image_label((h, w), regions, seed=seed)
