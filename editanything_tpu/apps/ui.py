"""Gradio UI — `create_demo_template` matching the reference surface.

Behavioral spec: /root/reference/editany_demo.py:9-466 (Click/Brush/All
tabs, control-scale + samples + seed sliders, auto-prompt checkbox,
pos/neg prompts, tile-refinement controls, cross-image-drag accordion,
advanced options) and the thin wrappers editany.py:10-26 /
editany_beauty.py / editany_handsome.py / app.py.

gradio is not part of this deployment image; the module import-gates it so
the rest of the framework stays importable headless. The `process` /
`process_image_click` callables have the same roles as the reference's.
"""

from __future__ import annotations

from typing import Callable, Optional

try:
    import gradio as gr
    HAS_GRADIO = True
except ImportError:      # headless deployment
    gr = None
    HAS_GRADIO = False


def require_gradio():
    if not HAS_GRADIO:
        raise ImportError(
            "gradio is not installed in this image; use the CLI entry "
            "points (editanything_tpu.apps.cli) or install gradio")


def create_demo_template(process: Callable,
                         process_image_click: Optional[Callable] = None,
                         *, examples=None, INFO: str = "EditAnything-TPU",
                         WARNING_INFO: Optional[str] = None,
                         enable_auto_prompt_default: bool = True):
    """Builds the edit UI (editany_demo.py:9 contract)."""
    require_gradio()

    block = gr.Blocks()
    with block:
        gr.Markdown(f"## {INFO}")
        with gr.Row():
            with gr.Column():
                source_image_click = gr.Image(
                    type="numpy", interactive=True,
                    label="Image: click to select objects")
                with gr.Row():
                    point_prompt = gr.Radio(
                        choices=["Foreground Point", "Background Point"],
                        value="Foreground Point", label="Point Label")
                    clear_button_click = gr.Button(value="Clear Click Points")
                source_image_brush = gr.Image(
                    type="numpy", tool="sketch", label="Brush the mask")
                enable_all_generate = gr.Checkbox(
                    label="Generate the whole image", value=False)
                prompt = gr.Textbox(label="Prompt")
                enable_auto_prompt = gr.Checkbox(
                    label="Auto generation of text prompt with BLIP2",
                    value=enable_auto_prompt_default)
                a_prompt = gr.Textbox(
                    label="Positive Prompt",
                    value="best quality, extremely detailed")
                n_prompt = gr.Textbox(
                    label="Negative Prompt",
                    value="longbody, lowres, bad anatomy, bad hands, "
                          "missing fingers, extra digit, fewer digits, "
                          "cropped, worst quality, low quality")
                control_scale = gr.Slider(
                    label="Mask Align strength", minimum=0, maximum=1,
                    value=0.5, step=0.1)
                num_samples = gr.Slider(
                    label="Images", minimum=1, maximum=12, value=2, step=1)
                seed = gr.Slider(label="Seed", minimum=-1, maximum=2147483647,
                                 step=1, randomize=True)
                enable_tile = gr.Checkbox(
                    label="Tile refinement for high resolution generation",
                    value=True)
                refine_alignment_ratio = gr.Slider(
                    label="Alignment Strength", minimum=0, maximum=1,
                    value=0.95, step=0.05)
                with gr.Accordion("Cross-image Drag", open=False):
                    ref_image = gr.Image(type="numpy", label="Reference")
                    ref_auto_prompt = gr.Checkbox(
                        label="Ref. auto prompt", value=True)
                    reference_attn = gr.Checkbox(
                        label="reference_attn", value=True)
                    reference_adain = gr.Checkbox(
                        label="reference_adain", value=False)
                    attention_auto_machine_weight = gr.Slider(
                        label="attn weight", minimum=0, maximum=1.0,
                        value=1.0, step=0.01)
                    gn_auto_machine_weight = gr.Slider(
                        label="gn weight", minimum=0, maximum=1.0,
                        value=1.0, step=0.01)
                    style_fidelity = gr.Slider(
                        label="Style fidelity", minimum=0, maximum=1.0,
                        value=0.5, step=0.01)
                    ref_scale = gr.Slider(
                        label="Frequency ref scale", minimum=0, maximum=1.0,
                        value=0.0, step=0.01)
                with gr.Accordion("Advanced options", open=False):
                    mask_image = gr.Image(
                        type="numpy", label="Predefined mask")
                    image_resolution = gr.Slider(
                        label="Image Resolution", minimum=256, maximum=768,
                        value=512, step=64)
                    refine_image_resolution = gr.Slider(
                        label="Refine Resolution", minimum=256, maximum=8192,
                        value=1024, step=64)
                    guess_mode = gr.Checkbox(label="Guess Mode", value=False)
                    detect_resolution = gr.Slider(
                        label="SAM Detect Resolution", minimum=128,
                        maximum=2048, value=1024, step=1)
                    ddim_steps = gr.Slider(
                        label="Steps", minimum=1, maximum=100, value=30,
                        step=1)
                    scale = gr.Slider(
                        label="Guidance Scale", minimum=0.1, maximum=30.0,
                        value=9.0, step=0.1)
                    alpha_weight = gr.Slider(
                        label="Alpha weight", minimum=0, maximum=1,
                        value=0.0, step=0.1)
                run_button = gr.Button(label="Run")
            with gr.Column():
                result_refined = gr.Gallery(label="Refined results")
                result_gallery = gr.Gallery(label="Results")
                result_mask = gr.Gallery(label="Segmentation / mask")
                result_prompt = gr.Textbox(label="Prompt used")

        inputs = [source_image_brush, enable_all_generate, mask_image,
                  control_scale, enable_auto_prompt, prompt, a_prompt,
                  n_prompt, num_samples, image_resolution, detect_resolution,
                  ddim_steps, guess_mode, scale, seed, alpha_weight,
                  enable_tile, refine_image_resolution,
                  refine_alignment_ratio, ref_image, ref_auto_prompt,
                  reference_attn, reference_adain,
                  attention_auto_machine_weight, gn_auto_machine_weight,
                  style_fidelity, ref_scale]
        run_button.click(fn=process, inputs=inputs,
                         outputs=[result_refined, result_gallery,
                                  result_mask, result_prompt])
        if process_image_click is not None:
            source_image_click.select(
                fn=process_image_click,
                inputs=[source_image_click, point_prompt],
                outputs=[source_image_click, mask_image])
        if WARNING_INFO:
            gr.Markdown(WARNING_INFO)
        if examples:
            gr.Examples(examples=examples, inputs=[prompt])
    return block


def create_demo(editor, **kw):
    """editany.py:10-26 equivalent: wire an EditAnythingEditor to the UI."""
    require_gradio()

    def process(brush, all_gen, mask_img, control_scale, auto_prompt, prompt,
                a_prompt, n_prompt, num_samples, image_resolution,
                detect_resolution, ddim_steps, guess_mode, scale, seed,
                alpha_weight, enable_tile, refine_res, refine_ratio,
                ref_image, ref_auto_prompt, reference_attn, reference_adain,
                attn_w, gn_w, style_fidelity, ref_scale):
        image = brush["image"] if isinstance(brush, dict) else brush
        mask = brush.get("mask") if isinstance(brush, dict) else mask_img
        tile, results, seg, used = editor.process(
            image=image, mask=mask, prompt=prompt, a_prompt=a_prompt,
            n_prompt=n_prompt, enable_auto_prompt=auto_prompt,
            enable_all_generate=all_gen, num_samples=int(num_samples),
            image_resolution=int(image_resolution),
            detect_resolution=int(detect_resolution),
            ddim_steps=int(ddim_steps), scale=scale,
            control_scale=control_scale, seed=int(seed),
            guess_mode=guess_mode, alpha_weight=alpha_weight,
            use_alpha_mixing=alpha_weight > 0, enable_tile=enable_tile,
            refine_image_resolution=int(refine_res),
            refine_alignment_ratio=refine_ratio,
            ref_image=ref_image,
            ref_mask=None if ref_image is None else
            (255 * (ref_image.sum(-1) < 750)).astype("uint8"),
            reference_attn=reference_attn, reference_adain=reference_adain,
            attention_auto_weight=attn_w, gn_auto_weight=gn_w,
            style_fidelity=style_fidelity, ref_scale=ref_scale)
        return tile, list(results), seg, used

    def process_image_click(image, point_label, evt: "gr.SelectData"):
        x, y = evt.index
        overlay, mask = editor.process_image_click(
            image, x, y, point_label == "Foreground Point")
        return overlay, mask

    return create_demo_template(process, process_image_click, **kw)
