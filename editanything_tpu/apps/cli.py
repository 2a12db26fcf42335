"""CLI entry points — the reference's script surface, headless.

Subcommands map 1:1 to the reference entry scripts:
  generate    -> /root/reference/sam2image.py (text+SAM-seg -> images)
  edit        -> /root/reference/editany.py via EditAnythingLoraModel.process
  sketch      -> /root/reference/sketch2image.py
  semantic    -> /root/reference/sam2semantic.py
  replay      -> /root/reference/editany_nogradio.py (pickle replay)
  caption-data-> /root/reference/dataset_build.py (BLIP2 captions -> data.txt)

Checkpoint paths are user-supplied (zero-egress image); every subcommand
accepts --bundle-spec, a json file naming the safetensors checkpoints:
{"unet": ..., "vae": ..., "text": ..., "tokenizer_merges": ...,
 "controlnets": {"sam": ..., "inpaint": ..., "tile": ...},
 "sam": ..., "blip2": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def _save_images(images, out_prefix: str):
    from PIL import Image
    paths = []
    for i, img in enumerate(np.asarray(images)):
        p = f"{out_prefix}_{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths


def _build_bundle(spec_path: str):
    from editanything_tpu.pipelines import load_bundle
    from editanything_tpu.text.tokenizer import CLIPTokenizer
    with open(spec_path) as f:
        spec = json.load(f)
    tok = CLIPTokenizer(vocab_path=spec["tokenizer_merges"])
    # optional kohya LoRA list: [{"path": ..., "multiplier": 1.0}, ...] or
    # plain path strings (editany_lora.py:197-329 list-of-LoRA support)
    lora_specs = [
        (s["path"], s.get("multiplier", 1.0)) if isinstance(s, dict)
        else (s, 1.0) for s in spec.get("lora", [])]
    return load_bundle(
        unet_path=spec["unet"], vae_path=spec["vae"],
        text_path=spec["text"], tokenizer=tok,
        controlnet_paths=spec.get("controlnets", {}),
        safety_path=spec.get("safety"), lora_specs=lora_specs), spec


def _build_editor(spec_path: str):
    from editanything_tpu.pipelines import EditAnythingEditor
    bundle, spec = _build_bundle(spec_path)
    sam = captioner = None
    if spec.get("sam"):
        from editanything_tpu.checkpoints import (load_torch_state_dict,
                                                  sam_to_tree)
        from editanything_tpu.models.sam import SAMConfig
        cfg = SAMConfig()
        sam = (cfg, sam_to_tree(load_torch_state_dict(spec["sam"])))
    if spec.get("blip2"):
        from editanything_tpu.checkpoints.convert import load_torch_state_dict
        from editanything_tpu.models import blip2 as B2
        from editanything_tpu.pipelines import Captioner
        from editanything_tpu.text.tokenizer import GPT2Tokenizer
        cfg = B2.BLIP2Config()
        params = load_torch_state_dict(spec["blip2"])  # tree via convert
        tok = GPT2Tokenizer.from_files(spec["blip2_vocab"],
                                       spec["blip2_merges"])
        captioner = Captioner(params, cfg, tok)
    return EditAnythingEditor(bundle, sam=sam, captioner=captioner), spec


def cmd_generate(args):
    from editanything_tpu.pipelines import GenerationPipeline
    bundle, _ = _build_bundle(args.bundle_spec)
    pipe = GenerationPipeline(bundle, controlnet="sam")
    cond = _load_image(args.condition)
    imgs = pipe(prompt=args.prompt, condition_image=cond,
                negative_prompt=args.negative_prompt,
                num_samples=args.num_samples,
                image_resolution=args.resolution, num_steps=args.steps,
                guidance_scale=args.scale, control_scale=args.control_scale,
                guess_mode=args.guess_mode, seed=args.seed)
    print("\n".join(_save_images(imgs, args.output)))


def cmd_edit(args):
    editor, _ = _build_editor(args.bundle_spec)
    mask = _load_image(args.mask)[..., 0] if args.mask else None
    tile, results, _, prompt = editor.process(
        image=_load_image(args.image), mask=mask, prompt=args.prompt,
        n_prompt=args.negative_prompt,
        enable_auto_prompt=args.auto_prompt,
        enable_all_generate=args.mask is None,
        num_samples=args.num_samples, image_resolution=args.resolution,
        detect_resolution=args.detect_resolution, ddim_steps=args.steps,
        scale=args.scale, control_scale=args.control_scale, seed=args.seed,
        alignment_ratio=args.alignment_ratio, enable_tile=args.tile,
        refine_image_resolution=args.refine_resolution)
    print("prompt:", prompt)
    print("\n".join(_save_images(results, args.output)))
    if tile:
        print("\n".join(_save_images(np.stack(tile), args.output + "_tile")))


def cmd_sketch(args):
    from editanything_tpu.pipelines import SketchPipeline
    bundle, _ = _build_bundle(args.bundle_spec)
    pipe = SketchPipeline(bundle, controlnet="sam")
    imgs = pipe(sketch=_load_image(args.sketch), prompt=args.prompt,
                use_scale_map=not args.no_scale_map,
                num_samples=args.num_samples,
                image_resolution=args.resolution, num_steps=args.steps,
                guidance_scale=args.scale, seed=args.seed)
    print("\n".join(_save_images(imgs, args.output)))


def cmd_semantic(args):
    editor, _ = _build_editor(args.bundle_spec)
    img = _load_image(args.image)
    cond = editor.get_sam_control(img)
    print("condition map saved:", _save_images(cond[None], args.output)[0])


# The reference's process() positional parameter order — a pickle captured
# from the actual reference UI stores all 35 of these in data["args"]
# (@save_input_to_file, /root/reference/annotator/util.py:77-95; replayed as
# model.process(*args, **kwargs), editany_nogradio.py:14). Order from
# /root/reference/editany_lora.py:609-644.
REF_PROCESS_PARAMS = (
    "source_image", "enable_all_generate", "mask_image", "control_scale",
    "enable_auto_prompt", "a_prompt", "n_prompt", "num_samples",
    "image_resolution", "detect_resolution", "ddim_steps", "guess_mode",
    "scale", "seed", "eta", "enable_tile", "refine_alignment_ratio",
    "refine_image_resolution", "alpha_weight", "use_scale_map",
    "condition_model", "ref_image", "attention_auto_machine_weight",
    "gn_auto_machine_weight", "style_fidelity", "reference_attn",
    "reference_adain", "ref_prompt", "ref_sam_scale", "ref_inpaint_scale",
    "ref_auto_prompt", "ref_textinv", "ref_textinv_path", "ref_scale",
)


def reference_call_to_kwargs(ref_args, ref_kwargs=None) -> dict:
    """Map a reference-format process() invocation (positional args in the
    editany_lora.py:609-644 order, plus reference-named kwargs) onto
    EditAnythingEditor.process's keyword-only surface.

    Gradio image dicts ({"image":…, "mask":…} from the brush/drag widgets,
    editany_lora.py:652-656,704-706) are unpacked; every reference knob maps
    1:1 (eta -> the DDIM eta; condition_model -> the SAM-ControlNet weight
    swap; ref_sam_scale/ref_inpaint_scale -> the ref write-pass scales)."""
    import numpy as _np
    ref = dict(zip(REF_PROCESS_PARAMS, ref_args))
    for k, v in (ref_kwargs or {}).items():
        if k in REF_PROCESS_PARAMS:
            ref[k] = v

    out = {}
    src = ref.get("source_image")
    if isinstance(src, dict):
        out["image"] = _np.asarray(src["image"], _np.uint8)
        brush_mask = src.get("mask")
    else:
        out["image"] = _np.asarray(src, _np.uint8)
        brush_mask = None
    mask = ref.get("mask_image")
    if mask is None and not ref.get("enable_all_generate", False):
        mask = brush_mask
    if mask is not None:
        mask = _np.asarray(mask, _np.uint8)
        if mask.ndim == 3:
            mask = mask[..., 0]
    out["mask"] = mask

    direct = ("enable_all_generate", "control_scale", "enable_auto_prompt",
              "a_prompt", "n_prompt", "num_samples", "image_resolution",
              "detect_resolution", "ddim_steps", "guess_mode", "scale",
              "seed", "eta", "enable_tile", "alpha_weight", "use_scale_map",
              "style_fidelity", "reference_attn", "reference_adain",
              "ref_prompt", "ref_auto_prompt", "ref_textinv",
              "ref_textinv_path", "ref_scale", "ref_sam_scale",
              "ref_inpaint_scale", "condition_model")
    for k in direct:
        if k in ref and ref[k] is not None:
            out[k] = ref[k]
    if ref.get("refine_alignment_ratio") is not None:
        out["refine_alignment_ratio"] = ref["refine_alignment_ratio"]
    if ref.get("refine_image_resolution") is not None:
        out["refine_image_resolution"] = ref["refine_image_resolution"]
    if ref.get("attention_auto_machine_weight") is not None:
        out["attention_auto_weight"] = ref["attention_auto_machine_weight"]
    if ref.get("gn_auto_machine_weight") is not None:
        out["gn_auto_weight"] = ref["gn_auto_machine_weight"]
    rimg = ref.get("ref_image")
    if isinstance(rimg, dict):
        out["ref_image"] = _np.asarray(rimg["image"], _np.uint8)
        if rimg.get("mask") is not None:
            out["ref_mask"] = _np.asarray(rimg["mask"], _np.uint8)
    elif rimg is not None:
        out["ref_image"] = _np.asarray(rimg, _np.uint8)
    # eta > 0 only has effect under the DDIM sampler (exactly the
    # reference's behavior: UniPC ignores eta)
    if out.get("eta", 0.0):
        out.setdefault("sampler", "ddim")
    return out


def is_reference_capture(pos, kwargs) -> bool:
    """Reference-format detection keys on reference-ONLY markers: native
    EA_SAVE_INPUTS captures share many kwarg names with the reference
    (a_prompt, num_samples, seed, ...) but always carry the native required
    kwarg `image` and never positional args or the reference's
    `source_image` first parameter."""
    return bool(pos) or "source_image" in kwargs or (
        "image" not in kwargs
        and any(k in REF_PROCESS_PARAMS for k in kwargs))


def cmd_replay(args):
    """Re-run a pickled process() invocation headless
    (editany_nogradio.py:1-16 semantics). Accepts BOTH pickle layouts:
    reference-captured (positional data["args"] in the 35-param order of
    editany_lora.py:609-644, reference-named kwargs) and this package's
    own EA_SAVE_INPUTS captures (keyword-only native names)."""
    editor, _ = _build_editor(args.bundle_spec)
    with open(args.pickle, "rb") as f:
        data = pickle.load(f)
    pos = tuple(data.get("args", ()))
    kwargs = dict(data.get("kwargs", {}))
    if is_reference_capture(pos, kwargs):
        kwargs = reference_call_to_kwargs(pos, kwargs)
    tile, results, _, prompt = editor.process(**kwargs)
    print("prompt:", prompt)
    print("\n".join(_save_images(results, args.output)))


def cmd_text_edit(args):
    """Text-grounded edit: detector boxes -> SAM mask -> inpaint
    (sam2vlpart_edit.py / sam2groundingdino_edit.py)."""
    editor, spec = _build_editor(args.bundle_spec)
    from editanything_tpu.perception.grounding import TextGuidedEditPipeline
    if args.detector == "vlpart":
        from editanything_tpu.checkpoints.convert import load_torch_state_dict
        from editanything_tpu.checkpoints.detectors import vlpart_to_tree
        from editanything_tpu.models import vlpart as VP
        from editanything_tpu.text.tokenizer import CLIPTokenizer
        cfg = VP.VLPartConfig()
        params = vlpart_to_tree(load_torch_state_dict(spec["vlpart"]))
        tok = CLIPTokenizer(vocab_path=spec["tokenizer_merges"])
        det = VP.VLPartDetector(params, cfg, tok)
        kw = dict(score_thresh=0.7)
    else:
        from editanything_tpu.checkpoints.convert import load_torch_state_dict
        from editanything_tpu.checkpoints.detectors import dino_to_tree
        from editanything_tpu.models import groundingdino as GD
        from editanything_tpu.text.tokenizer import BertTokenizer
        cfg = GD.DINOConfig()
        params = dino_to_tree(load_torch_state_dict(spec["groundingdino"]))
        tok = BertTokenizer.from_file(spec["bert_vocab"])
        det = GD.GroundingDINODetector(params, cfg, tok)
        kw = dict(score_thresh=0.25, max_boxes=2)
    pipe = TextGuidedEditPipeline(editor, det, **kw)
    _, results, _, prompt = pipe(
        image=_load_image(args.image), mask_prompt=args.mask_prompt,
        prompt=args.prompt, num_samples=args.num_samples,
        image_resolution=args.resolution, ddim_steps=args.steps,
        scale=args.scale, control_scale=args.control_scale, seed=args.seed)
    print("prompt:", prompt)
    print("\n".join(_save_images(results, args.output)))


def cmd_caption_data(args):
    """BLIP2-caption every jpg -> data.txt (dataset_build.py:14-40)."""
    editor, _ = _build_editor(args.bundle_spec)
    names = sorted(n for n in os.listdir(args.data_path)
                   if n.endswith(".jpg"))
    with open(args.output, "w") as f:
        for name in names:
            img = _load_image(os.path.join(args.data_path, name))
            text = editor.get_blip2_text(img)
            f.write(repr({"target": name, "source": name[:-4] + ".json",
                          "prompt": text}) + "\n")
    print(f"wrote {len(names)} lines to {args.output}")


def cmd_add_control(args):
    """SD .ckpt/.safetensors -> cldm checkpoint with grafted control branch
    (tools/tool_add_control_sd{15,21}.py:27-50)."""
    import torch
    from editanything_tpu.checkpoints import add_control, \
        load_torch_state_dict
    if os.path.exists(args.output):
        raise SystemExit(f"output {args.output} already exists")
    sd = load_torch_state_dict(args.input)
    out = add_control(sd, seed=args.seed, hint_channels=args.hint_channels)
    n_ctrl = sum(k.startswith("control_model.") for k in out)
    torch.save({"state_dict": {k: torch.tensor(np.asarray(v))
                               for k, v in out.items()}}, args.output)
    print(f"wrote {args.output}: {n_ctrl} control_model keys grafted")


def cmd_transfer_control(args):
    """Offset-transfer a trained control to another base
    (tool_transfer_control.py:35-58)."""
    import torch
    from editanything_tpu.checkpoints import load_torch_state_dict, \
        transfer_control
    out = transfer_control(load_torch_state_dict(args.base),
                           load_torch_state_dict(args.base_with_control),
                           load_torch_state_dict(args.new_base))
    torch.save({"state_dict": {k: torch.tensor(np.asarray(v))
                               for k, v in out.items()}}, args.output)
    print(f"wrote {args.output}: {len(out)} keys")


def cmd_convert_to_diffusers(args):
    """Trained cldm checkpoint -> diffusers-layout ControlNet safetensors
    (tools/convert_controlnet_to_diffusers.py:80-91)."""
    from safetensors.numpy import save_file
    from editanything_tpu.checkpoints import cldm_controlnet_to_diffusers_sd
    sd = cldm_controlnet_to_diffusers_sd(args.input,
                                         extract_ema=args.extract_ema)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              args.output)
    print(f"wrote {args.output}: {len(sd)} tensors")


def main(argv=None):
    p = argparse.ArgumentParser("editanything-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--bundle-spec", required=True)
        sp.add_argument("--output", default="out")
        sp.add_argument("--prompt", default="")
        sp.add_argument("--negative-prompt", default="")
        sp.add_argument("--num-samples", type=int, default=1)
        sp.add_argument("--resolution", type=int, default=512)
        sp.add_argument("--steps", type=int, default=30)
        sp.add_argument("--scale", type=float, default=9.0)
        sp.add_argument("--control-scale", type=float, default=0.5)
        sp.add_argument("--seed", type=int, default=0)

    g = sub.add_parser("generate")
    common(g)
    g.add_argument("--condition", required=True)
    g.add_argument("--guess-mode", action="store_true")
    g.set_defaults(fn=cmd_generate)

    e = sub.add_parser("edit")
    common(e)
    e.add_argument("--image", required=True)
    e.add_argument("--mask")
    e.add_argument("--auto-prompt", action="store_true")
    e.add_argument("--detect-resolution", type=int, default=1024)
    e.add_argument("--alignment-ratio", type=float)
    e.add_argument("--tile", action="store_true")
    e.add_argument("--refine-resolution", type=int, default=1024)
    e.set_defaults(fn=cmd_edit)

    s = sub.add_parser("sketch")
    common(s)
    s.add_argument("--sketch", required=True)
    s.add_argument("--no-scale-map", action="store_true")
    s.set_defaults(fn=cmd_sketch)

    m = sub.add_parser("semantic")
    common(m)
    m.add_argument("--image", required=True)
    m.set_defaults(fn=cmd_semantic)

    r = sub.add_parser("replay")
    common(r)
    r.add_argument("--pickle", default="input_data.pkl")
    r.set_defaults(fn=cmd_replay)

    t = sub.add_parser("text-edit")
    common(t)
    t.add_argument("--image", required=True)
    t.add_argument("--mask-prompt", required=True,
                   help="text describing the region, e.g. 'dog head'")
    t.add_argument("--detector", choices=("vlpart", "groundingdino"),
                   default="groundingdino")
    t.set_defaults(fn=cmd_text_edit)

    c = sub.add_parser("caption-data")
    common(c)
    c.add_argument("--data-path", required=True)
    c.set_defaults(fn=cmd_caption_data)

    ac = sub.add_parser("add-control")
    ac.add_argument("--input", required=True)
    ac.add_argument("--output", required=True)
    ac.add_argument("--seed", type=int, default=0)
    ac.add_argument("--hint-channels", type=int, default=3)
    ac.set_defaults(fn=cmd_add_control)

    tc = sub.add_parser("transfer-control")
    tc.add_argument("--base", required=True)
    tc.add_argument("--base-with-control", required=True)
    tc.add_argument("--new-base", required=True)
    tc.add_argument("--output", required=True)
    tc.set_defaults(fn=cmd_transfer_control)

    cd = sub.add_parser("convert-to-diffusers")
    cd.add_argument("--input", required=True)
    cd.add_argument("--output", required=True)
    cd.add_argument("--extract-ema", action="store_true")
    cd.set_defaults(fn=cmd_convert_to_diffusers)

    # training programs: delegate to their own argparse mains (the
    # reference's sam_train_sd21.py / tools/train_dreambooth_inpaint.py /
    # utils/texutal_inversion.py script surface)
    for name, module in (("train-controlnet",
                          "editanything_tpu.train.train_controlnet"),
                         ("train-dreambooth",
                          "editanything_tpu.train.train_dreambooth"),
                         ("train-ti", "editanything_tpu.train.train_ti")):
        tp = sub.add_parser(name, add_help=False)
        tp.set_defaults(fn=None, train_module=module)

    args, extra = p.parse_known_args(argv)
    if getattr(args, "train_module", None):
        import importlib
        return importlib.import_module(args.train_module).main(extra)
    if extra:
        p.error(f"unrecognized arguments: {' '.join(extra)}")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
