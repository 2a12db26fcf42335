"""SAM mask bit-match harness vs the official torch `segment_anything`.

BASELINE.md demands bit-matching SAM masks. Real ViT-H weights and the torch
package are not available in this container, so this harness is staged to run
the day they are:

  1. Record goldens on any torch box (script in the --help epilog):
     run `SamAutomaticMaskGenerator.generate` on an image, save the stacked
     boolean masks + (x0,y0,x1,y1) boxes + predicted IoUs to golden.npz.
  2. Here: `python tools/sam_bitmatch.py --checkpoint sam_vit_h_4b8939.pth \
        --image photo.jpg --golden golden.npz`
     converts the .pth with checkpoints.convert.sam_to_tree, runs the
     compiled AMG (perception/amg.py), and diffs mask-by-mask.

Without --checkpoint it runs end-to-end on random weights (smoke mode, used
by tests); without --golden it records OUR masks to --output for later diffs
across refactors.

Reference flow being matched: /root/reference/editany_lora.py:522-543
(SamAutomaticMaskGenerator grid generate -> masks sorted by area in
show_anns :426-449).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

RECORD_SNIPPET = """\
# Run on a torch box with `segment_anything` + the official checkpoint:
import numpy as np
from segment_anything import (SamAutomaticMaskGenerator,
                              sam_model_registry)
sam = sam_model_registry["vit_h"](checkpoint="sam_vit_h_4b8939.pth")
gen = SamAutomaticMaskGenerator(sam)
import cv2
image = cv2.cvtColor(cv2.imread("photo.jpg"), cv2.COLOR_BGR2RGB)
anns = gen.generate(image)
np.savez_compressed(
    "golden.npz",
    masks=np.stack([a["segmentation"] for a in anns]),
    ious=np.array([a["predicted_iou"] for a in anns]),
    areas=np.array([a["area"] for a in anns]))
"""


def synthetic_image(h: int = 512, w: int = 512, seed: int = 0) -> np.ndarray:
    """Deterministic structured test image (no binary assets in-repo):
    colored rectangles + circles on a gradient background."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 255 // max(w - 1, 1)),
        (yy * 255 // max(h - 1, 1)),
        np.full((h, w), 96),
    ], axis=-1).astype(np.int64)
    side = min(h, w)
    for _ in range(6):
        x0, y0 = rng.integers(0, max(w // 2, 1)), rng.integers(0, max(h // 2, 1))
        bw, bh = rng.integers(side // 8 + 1, side // 3 + 2, 2)
        color = rng.integers(0, 256, 3)
        img[y0:y0 + bh, x0:x0 + bw] = color
    for _ in range(4):
        m = side // 8 + 1
        cx, cy = rng.integers(m, w - m), rng.integers(m, h - m)
        r = int(rng.integers(side // 16 + 1, side // 6 + 2))
        color = rng.integers(0, 256, 3)
        circle = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[circle] = color
    return img.astype(np.uint8)


def run_amg(sam_params, sam_cfg, amg_cfg, image: np.ndarray):
    """Image -> upsampled boolean masks at image resolution, in slot order.

    Returns dict(masks (K, H, W) bool, ious (K,), areas (K,)) with only the
    valid slots, mirroring SamAutomaticMaskGenerator.generate output order
    as painted by show_anns (editany_lora.py:426-449)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from editanything_tpu.models import sam as SAM
    from editanything_tpu.perception import build_amg
    from editanything_tpu.perception.amg import _grid_points

    h, w = image.shape[:2]
    scale = sam_cfg.img_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    resized = np.asarray(
        PILImage.fromarray(image).resize((nw, nh), PILImage.BILINEAR))
    x = SAM.preprocess(jnp.asarray(resized), sam_cfg)

    encode, generate = build_amg(sam_cfg, amg_cfg)
    emb = jax.jit(encode)(sam_params, x)
    pts = jnp.asarray(_grid_points(amg_cfg, nh, nw))
    out = jax.jit(generate)(sam_params, emb, pts)

    valid = np.asarray(out["valid"])
    logits = np.asarray(out["logits"])[valid]            # (K, 256, 256)
    # upsample low-res logits to full image resolution, threshold at 0 —
    # torch SAM's postprocess_masks bilinear upsample + mask_threshold
    up = jax.image.resize(jnp.asarray(logits), (logits.shape[0], h, w),
                          method="bilinear")
    masks = np.asarray(up > amg_cfg.mask_threshold)
    return {
        "masks": masks,
        "ious": np.asarray(out["scores"])[valid],
        "areas": masks.sum(axis=(1, 2)),
    }


def diff_masks(ours: dict, golden: dict) -> dict:
    """Bit-level mask diff; masks matched greedily by IoU."""
    om, gm = ours["masks"], golden["masks"]
    report = {"ours": int(om.shape[0]), "golden": int(gm.shape[0]),
              "matched": 0, "bit_exact": 0, "mean_iou": 0.0, "pairs": []}
    if om.shape[0] == 0 or gm.shape[0] == 0:
        return report
    o = om.reshape(om.shape[0], -1).astype(np.int64)
    g = gm.reshape(gm.shape[0], -1).astype(np.int64)
    inter = o @ g.T
    union = o.sum(1)[:, None] + g.sum(1)[None, :] - inter
    iou = inter / np.maximum(union, 1)
    iou = iou.copy()
    ious = []
    for _ in range(min(len(o), len(g))):
        i, j = divmod(int(np.argmax(iou)), len(g))
        if iou[i, j] <= 0:
            break
        best = float(iou[i, j])
        iou[i, :] = -1.0
        iou[:, j] = -1.0
        exact = bool((om[i] == gm[j]).all())
        ious.append(best)
        report["pairs"].append({"ours": i, "golden": j, "iou": best,
                                "bit_exact": exact})
        report["bit_exact"] += int(exact)
    report["matched"] = len(ious)
    report["mean_iou"] = float(np.mean(ious)) if ious else 0.0
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, epilog=RECORD_SNIPPET,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--checkpoint", help="sam_vit_h_4b8939.pth (torch); "
                    "omitted = random weights (smoke mode)")
    ap.add_argument("--variant", default="vit_h",
                    choices=("vit_b", "vit_l", "vit_h"))
    ap.add_argument("--image", help="input image; omitted = deterministic "
                    "synthetic image")
    ap.add_argument("--golden", help="golden.npz recorded from torch "
                    "segment_anything (see epilog)")
    ap.add_argument("--output", default="sam_masks.npz",
                    help="where to record OUR masks")
    ap.add_argument("--min-iou", type=float, default=1.0,
                    help="fail unless every matched pair has IoU >= this "
                    "(1.0 = bit-match)")
    args = ap.parse_args(argv)

    from editanything_tpu.models import sam as SAM
    from editanything_tpu.perception import AMGConfig

    sam_cfg = {"vit_b": SAM.sam_vit_b, "vit_l": SAM.sam_vit_l,
               "vit_h": SAM.sam_vit_h}[args.variant]()
    amg_cfg = AMGConfig()

    if args.checkpoint:
        from editanything_tpu.checkpoints import (load_torch_state_dict,
                                                  sam_to_tree)
        params = sam_to_tree(load_torch_state_dict(args.checkpoint))
    else:
        import jax
        print("no --checkpoint: running with RANDOM weights (smoke mode); "
              "mask contents are meaningless", file=sys.stderr)
        params = SAM.init_sam(jax.random.PRNGKey(0), sam_cfg)

    if args.image:
        from PIL import Image
        image = np.asarray(Image.open(args.image).convert("RGB"))
    else:
        image = synthetic_image()

    ours = run_amg(params, sam_cfg, amg_cfg, image)
    np.savez_compressed(args.output, **ours)
    print(f"recorded {ours['masks'].shape[0]} masks -> {args.output}")

    if args.golden:
        golden = dict(np.load(args.golden))
        report = diff_masks(ours, golden)
        print(json.dumps(report, indent=2))
        ok = (report["matched"] == report["golden"] == report["ours"]
              and all(p["iou"] >= args.min_iou for p in report["pairs"]))
        if args.min_iou >= 1.0:
            ok = ok and report["bit_exact"] == report["matched"]
        print("BIT-MATCH: " + ("PASS" if ok else "FAIL"))
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
