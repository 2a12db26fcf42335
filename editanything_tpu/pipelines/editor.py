"""EditAnythingEditor — the top-level orchestrator (SAM + BLIP2 + edit).

Behavioral spec: /root/reference/editany_lora.py:452-938
(`EditAnythingLoraModel`): wires SAM (auto masks + click predictor), BLIP2
auto-prompting, the multi-ControlNet inpaint pipeline, and the tile
refinement pass behind `process()` / `process_image_click()`.

TPU design differences:
- pipeline "rebuilds" (:659-703) are weight swaps on ModelBundle — the
  compiled programs persist across checkpoint switches
- SAM auto-mask generation is the compiled fixed-shape AMG
  (perception/amg.py) instead of the torch Python grid loop
- the click predictor caches the image embedding; repeated clicks are
  ~ms decoder calls with fixed prompt slots (no retrace)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editanything_tpu.perception import AMGConfig, build_amg, encode_id_map
from editanything_tpu.perception.predictor import SamPredictor
from editanything_tpu.pipelines.bundle import ModelBundle
from editanything_tpu.pipelines.edit import EditPipeline
from editanything_tpu.utils import HWC3, resize_image, resize_points


def draw_click_overlay(image: np.ndarray, mask: np.ndarray,
                       points: Sequence[Tuple[int, int, int]],
                       radius: int = 5) -> np.ndarray:
    """Green mask @0.75 alpha + point circles (green=fg, red=bg) —
    reference overlay semantics (editany_lora.py:581-601), numpy only."""
    out = image.astype(np.float32).copy()
    m = mask.astype(bool)
    green = np.array([0.0, 255.0, 0.0], np.float32)
    out[m] = 0.25 * out[m] + 0.75 * green
    h, w = out.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    for (x, y, lab) in points:
        disk = (xx - x) ** 2 + (yy - y) ** 2 <= radius ** 2
        out[disk] = green if lab == 1 else np.array([255.0, 0.0, 0.0])
    return out.clip(0, 255).astype(np.uint8)


class EditAnythingEditor:
    """process()/process_image_click() orchestration over TPU pipelines."""

    def __init__(self, bundle: ModelBundle, *,
                 sam: Optional[tuple] = None,          # (SAMConfig, params)
                 captioner=None,                       # pipelines.Captioner
                 extra_inpaint: bool = True,
                 tile_control: str = "tile",
                 amg_config: Optional[AMGConfig] = None):
        self.bundle = bundle
        controls = ("sam", "inpaint") if extra_inpaint and \
            "inpaint" in bundle.controlnets else ("sam",)
        self.pipe = EditPipeline(bundle, controls=controls,
                                 inpaint_mode="blend")
        self.mix_pipe = EditPipeline(bundle, controls=controls,
                                     inpaint_mode="mix")
        self.mix_pipe.cache = self.pipe.cache
        self.tile_control = tile_control if tile_control in \
            bundle.controlnets else None
        self.captioner = captioner
        self.sam = sam
        self.amg_cfg = amg_config or AMGConfig()
        if sam is not None:
            sam_cfg, sam_params = sam
            self.sam_predictor = SamPredictor(sam_params, sam_cfg)
            self._amg_encode, self._amg_generate = build_amg(
                sam_cfg, self.amg_cfg)
        self.click_points: List[Tuple[int, int, int]] = []
        # textual-inversion staging (editany_lora.py:738 path + the
        # run_texutal_inversion.sh placeholder)
        self.textinv_stage_dir = "./utils/tmp/textinv/img"
        self.textinv_token = "<new-obj>"
        # condition-model switching (editany_lora.py:677-693): name/path ->
        # weight swap on the SAM ControlNet slot, no pipeline rebuild.
        # "EditAnything" is the reference's sentinel for "keep the default".
        self.current_condition_model = "EditAnything"
        # optional registry: name -> checkpoint path (the reference's
        # config_dict names, demos.CONFIG_DICT) for non-path names
        self.condition_model_paths: dict = {}

    def set_condition_model(self, name_or_path: str) -> bool:
        """Hot-swap the SAM-condition ControlNet weights (the reference
        rebuilds the whole pipeline on condition-model change,
        editany_lora.py:677-693; here the compiled programs persist and
        only the param tree swaps). Returns True if a swap happened."""
        import os
        if name_or_path in (None, "", self.current_condition_model):
            return False
        path = self.condition_model_paths.get(name_or_path, name_or_path)
        if not os.path.exists(path):
            import warnings
            warnings.warn(
                f"condition model {name_or_path!r} is not a local path and "
                "has no entry in editor.condition_model_paths; keeping "
                f"{self.current_condition_model!r} (zero-egress image "
                "cannot fetch HF repos)")
            return False
        from editanything_tpu.checkpoints import (diffusers_to_tree,
                                                  load_torch_state_dict)
        params = diffusers_to_tree(load_torch_state_dict(path),
                                   dtype=self.bundle.dtype)
        self.bundle.swap_controlnet("sam", params)
        self.current_condition_model = name_or_path
        return True

    # -- captioning -----------------------------------------------------------

    def get_blip2_text(self, image: np.ndarray) -> str:
        """editany_lora.py:512-520."""
        if self.captioner is None:
            return ""
        return self.captioner(image[None])[0]

    # -- SAM auto condition ----------------------------------------------------

    def get_sam_control(self, image: np.ndarray) -> np.ndarray:
        """Full-image auto masks -> uint8 (H, W, 3) R/G ID condition map
        (editany_lora.py:522-525 + show_anns :426-449)."""
        assert self.sam is not None, "no SAM weights in this editor"
        sam_cfg, sam_params = self.sam
        from editanything_tpu.models import sam as SAM
        from editanything_tpu.perception.amg import _grid_points
        h, w = image.shape[:2]
        scale = sam_cfg.img_size / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        from PIL import Image as PILImage
        resized = np.asarray(
            PILImage.fromarray(image).resize((nw, nh), PILImage.BILINEAR))
        x = SAM.preprocess(jnp.asarray(resized), sam_cfg)
        emb = self._amg_encode(sam_params, x)
        pts = _grid_points(self.amg_cfg, nh, nw)
        out = self._amg_generate(sam_params, emb, jnp.asarray(pts))
        cond = encode_id_map(out["logits"], out["valid"], out_hw=(h, w))
        return np.asarray(jax.device_get(cond))

    # -- region-level semantics (sam2semantic.py) -------------------------------

    def semantic(self, image: np.ndarray, *, top_k: int = 10,
                 detect_resolution: int = 1024):
        """Region-level semantic labels + rendered overlay
        (sam2semantic.py:73-146): SAM auto masks ranked by area, each
        crop BLIP2-classified, labels drawn on a color overlay."""
        assert self.sam is not None and self.captioner is not None
        from editanything_tpu.apps.demos import semantic_overlay
        from editanything_tpu.pipelines.captioner import semantic_labels
        sam_cfg, sam_params = self.sam
        from editanything_tpu.models import sam as SAM
        from editanything_tpu.perception.amg import _grid_points
        from PIL import Image as PILImage

        img = resize_image(HWC3(image.astype(np.uint8)), detect_resolution)
        h, w = img.shape[:2]
        scale = sam_cfg.img_size / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        resized = np.asarray(PILImage.fromarray(img).resize(
            (nw, nh), PILImage.BILINEAR))
        x = SAM.preprocess(jnp.asarray(resized), sam_cfg)
        emb = self._amg_encode(sam_params, x)
        pts = _grid_points(self.amg_cfg, nh, nw)
        out = self._amg_generate(sam_params, emb, jnp.asarray(pts))

        logits = np.asarray(jax.device_get(out["logits"]))
        valid = np.asarray(jax.device_get(out["valid"]))
        areas = np.asarray(jax.device_get(out["areas"]))
        # upscale only the top_k largest masks from the 256^2 slab to image
        # resolution (all 256 would be hundreds of MB at 1024^2)
        order = np.argsort(-np.where(valid, areas, -1))[:top_k]
        up = np.asarray(jax.device_get(jax.image.resize(
            jnp.asarray(logits[order]), (len(order), h, w),
            method="bilinear")))
        masks_hr = up > self.amg_cfg.mask_threshold
        labels_local = semantic_labels(
            img, masks_hr, valid[order],
            masks_hr.reshape(len(order), -1).sum(-1),
            self.captioner, top_k=top_k)
        # map local (top_k-subset) indices back to AMG slot ids
        labels = [(int(order[i]), lab) for i, lab in labels_local]
        overlay = semantic_overlay(
            img, up, valid[order],
            [(i, lab) for i, lab in labels_local],
            mask_threshold=self.amg_cfg.mask_threshold)
        return labels, overlay

    # -- interactive click segmentation -----------------------------------------

    def process_image_click(self, image: np.ndarray, x: int, y: int,
                            is_foreground: bool = True,
                            detect_resolution: int = 1024):
        """Accumulate click points, predict the mask, return (overlay,
        mask) — editany_lora.py:545-607."""
        self.click_points.append((x, y, 1 if is_foreground else 0))
        img = resize_image(HWC3(image.astype(np.uint8)), detect_resolution)
        pts = resize_points(self.click_points, image.shape,
                            detect_resolution)
        self.sam_predictor.set_image(img)
        coords = np.array([[p[0], p[1]] for p in pts], np.float32)
        labels = np.array([p[2] for p in pts], np.int32)
        masks, _, _ = self.sam_predictor.predict(
            point_coords=coords, point_labels=labels,
            multimask_output=False)
        mask = masks[0]
        overlay = draw_click_overlay(img, mask, pts)
        return overlay, (mask.astype(np.uint8) * 255)

    def clear_clicks(self):
        self.click_points = []

    # -- cross-image drag helpers -----------------------------------------------

    @staticmethod
    def _crop_masked_region(ref_image: np.ndarray,
                            ref_mask: Optional[np.ndarray]) -> np.ndarray:
        """BBox-crop the masked ref region, masked pixels kept
        (editany_lora.py:708-722)."""
        img = HWC3(np.asarray(ref_image, np.uint8))
        if ref_mask is None:
            return img
        m = np.asarray(ref_mask, np.float32)
        if m.ndim == 3:
            m = m[..., 0]
        if m.max() > 1.5:
            m = m / 255.0
        ys, xs = np.nonzero(m >= 0.5)
        if len(ys) == 0:
            return img
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        crop = img[y0:y1, x0:x1].astype(np.float32)
        crop *= m[y0:y1, x0:x1, None]
        return crop.astype(np.uint8)

    def _load_or_stage_textinv(self, crop: np.ndarray,
                               path: Optional[str]) -> bool:
        """Load a TI embedding into the text encoder if `path` exists;
        otherwise stage the ref crop as TI training data
        (editany_lora.py:732-745 load-or-prepare behavior). Returns True
        if an embedding was loaded. On load, the placeholder token is
        registered with the tokenizer so prompts containing it resolve to
        the appended rows."""
        import os
        if path and os.path.exists(path):
            from editanything_tpu.checkpoints.lora import load_ti_file
            from editanything_tpu.train.textual_inversion import \
                load_textual_inversion
            embeds = load_ti_file(path)
            self.bundle.text, ids = load_textual_inversion(
                self.bundle.text, embeds)
            self.bundle.tokenizer.add_placeholder(self.textinv_token, ids)
            return True
        os.makedirs(self.textinv_stage_dir, exist_ok=True)
        from PIL import Image as PILImage
        PILImage.fromarray(crop).save(
            os.path.join(self.textinv_stage_dir, "ref.png"))
        print(f"No textual-inversion embedding found; staged the ref crop "
              f"in {self.textinv_stage_dir} — train with "
              f"`editanything-tpu train-ti --train-data-dir "
              f"{self.textinv_stage_dir}` (editany_lora.py:737-745)")
        return False

    def train_staged_textinv(self, output_path: str, *,
                             max_steps: int = 3000, num_vectors: int = 10,
                             batch_size: int = 4, resolution: int = 512,
                             lr: float = 5e-4, seed: int = 0,
                             **kwargs) -> str:
        """Run textual inversion on the staged ref crop(s) and load the
        learned embedding into this editor's bundle (the reference's
        run_texutal_inversion.sh flow made callable). Returns output_path;
        subsequent process(ref_textinv=True, ref_textinv_path=output_path)
        — or prompts containing the placeholder — use the embedding."""
        from editanything_tpu.train.train_ti import train_textual_inversion
        train_textual_inversion(
            data_dir=self.textinv_stage_dir, output_path=output_path,
            bundle=self.bundle, placeholder_token=self.textinv_token,
            max_steps=max_steps, num_vectors=num_vectors,
            batch_size=batch_size, resolution=resolution, lr=lr,
            seed=seed, **kwargs)
        return output_path

    # -- the main edit ----------------------------------------------------------

    def process(self, *, image: np.ndarray, mask: Optional[np.ndarray],
                prompt: str = "", a_prompt: str = "", n_prompt: str = "",
                condition_image: Optional[np.ndarray] = None,
                enable_auto_prompt: bool = False,
                enable_all_generate: bool = False,
                num_samples: int = 1, image_resolution: int = 512,
                detect_resolution: int = 1024,
                ddim_steps: int = 30, scale: float = 9.0,
                control_scale: float = 0.5, seed: int = 0,
                eta: float = 0.0, sampler: str = "unipc",
                condition_model: Optional[str] = None,
                guess_mode: bool = False,
                use_scale_map: bool = False,
                scale_map: Optional[np.ndarray] = None,
                alpha_weight: float = 0.5, use_alpha_mixing: bool = False,
                alignment_ratio: Optional[float] = None,
                enable_tile: bool = False,
                refine_image_resolution: int = 1024,
                refine_alignment_ratio: float = 0.95,
                ref_image: Optional[np.ndarray] = None,
                ref_mask: Optional[np.ndarray] = None,
                ref_prompt: Optional[str] = None,
                ref_auto_prompt: bool = False,
                ref_textinv: bool = False,
                ref_textinv_path: Optional[str] = None,
                reference_attn: bool = True, reference_adain: bool = False,
                attention_auto_weight: float = 1.0,
                gn_auto_weight: float = 1.0,
                style_fidelity: float = 0.5, ref_scale: float = 0.0,
                ref_sam_scale: Optional[float] = None,
                ref_inpaint_scale: Optional[float] = None):
        """Returns (results_tile, results, [condition_map, mask], prompt) —
        the reference's process() contract (editany_lora.py:609-938)."""
        import os
        if condition_model is not None:
            self.set_condition_model(condition_model)
        if os.environ.get("EA_SAVE_INPUTS") == "1":
            # pickle-replay capture (reference @save_input_to_file on
            # process, annotator/util.py:77-95; replay via the CLI)
            import pickle
            with open("input_data.pkl", "wb") as f:
                pickle.dump({"args": (), "kwargs": dict(
                    image=image, mask=mask, prompt=prompt,
                    a_prompt=a_prompt, n_prompt=n_prompt,
                    condition_image=condition_image,
                    num_samples=num_samples,
                    image_resolution=image_resolution,
                    ddim_steps=ddim_steps, scale=scale,
                    control_scale=control_scale, seed=seed)}, f)
        image = HWC3(np.asarray(image, np.uint8))

        if enable_auto_prompt and self.captioner is not None:
            blip2_prompt = self.get_blip2_text(
                resize_image(image, min(detect_resolution, 512)))
            prompt = (blip2_prompt + ", " + prompt) if prompt \
                else blip2_prompt

        # cross-image-drag ref prep (editany_lora.py:704-745): crop the
        # masked ref region; BLIP2-caption it into the ref prompt; load a
        # textual-inversion embedding or stage the crop for TI training
        if ref_image is not None and (ref_auto_prompt or ref_textinv):
            crop = self._crop_masked_region(ref_image, ref_mask)
            if ref_auto_prompt and self.captioner is not None:
                gen = self.get_blip2_text(crop)
                ref_prompt = (ref_prompt or "") + gen
                a_prompt = a_prompt + gen
            if ref_textinv:
                self._load_or_stage_textinv(crop, ref_textinv_path)

        if condition_image is None:
            detect_img = resize_image(image, detect_resolution)
            condition_image = self.get_sam_control(detect_img)

        positive = f"{prompt}, {a_prompt}" if a_prompt else prompt

        if enable_all_generate or mask is None:
            mask = np.full(image.shape[:2], 255, np.uint8)

        if use_scale_map and scale_map is None and mask is not None:
            # reference derives the per-pixel control scale from the edit
            # mask: SAM control zeroed INSIDE the edit region
            # (editany_lora.py:829-839: 1 - binarize(mask))
            m01 = np.asarray(mask, np.float32)
            if m01.ndim == 3:
                m01 = m01[..., 0]
            if m01.max() > 1.5:
                m01 = m01 / 255.0
            scale_map = 1.0 - (m01 >= 0.5).astype(np.float32)

        pipe = self.mix_pipe if use_alpha_mixing else self.pipe
        results = pipe(
            image=image, mask=mask, prompt=positive,
            condition_image=condition_image, negative_prompt=n_prompt,
            num_samples=num_samples, image_resolution=image_resolution,
            num_steps=ddim_steps, guidance_scale=scale,
            control_scale=control_scale, sampler=sampler, eta=eta,
            scale_map=scale_map if use_scale_map else None,
            alignment_ratio=alignment_ratio, alpha_weight=alpha_weight,
            guess_mode=guess_mode, seed=seed,
            ref_image=ref_image, ref_mask=ref_mask, ref_prompt=ref_prompt,
            reference_attn=reference_attn, reference_adain=reference_adain,
            attention_auto_weight=attention_auto_weight,
            gn_auto_weight=gn_auto_weight,
            style_fidelity=style_fidelity, ref_scale=ref_scale,
            ref_sam_scale=ref_sam_scale, ref_inpaint_scale=ref_inpaint_scale)

        results_tile = []
        if enable_tile and self.tile_control is not None:
            results_tile = self.pipe.tile_refine(
                results, mask, positive, tile_control=self.tile_control,
                negative_prompt=n_prompt,
                refine_image_resolution=refine_image_resolution,
                num_steps=ddim_steps, guidance_scale=scale,
                alignment_ratio=refine_alignment_ratio, seed=seed)

        return (results_tile, [results[i] for i in range(len(results))],
                [condition_image, mask], positive)
