"""Top-level EditAnythingEditor orchestration test (tiny everything)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.models import sam as SAM
from editanything_tpu.models import blip2 as B2
from editanything_tpu.perception import AMGConfig
from editanything_tpu.pipelines import random_bundle
from editanything_tpu.pipelines.captioner import Captioner
from editanything_tpu.pipelines.editor import EditAnythingEditor
from editanything_tpu.text.tokenizer import tiny_gpt2_tokenizer

TINY_SAM = SAM.SAMConfig(
    img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
    global_attn_indexes=(1,), window_size=4, out_chans=16,
    prompt_embed_dim=16, decoder_mlp_dim=32,
)


@pytest.fixture(scope="module")
def editor():
    bundle = random_bundle(jax.random.PRNGKey(0), tiny=True,
                           controlnet_names=("sam", "inpaint", "tile"))
    sam_params = SAM.init_sam(jax.random.PRNGKey(1), TINY_SAM)
    bcfg = B2.tiny_blip2_config()
    cap = Captioner(B2.init_blip2(jax.random.PRNGKey(2), bcfg), bcfg,
                    tiny_gpt2_tokenizer(), max_new_tokens=3)
    return EditAnythingEditor(
        bundle, sam=(TINY_SAM, sam_params), captioner=cap,
        extra_inpaint=True,
        amg_config=AMGConfig(points_per_side=4, points_per_batch=16,
                             pred_iou_thresh=-10.0,
                             stability_score_thresh=-1.0, max_masks=16))


def _image(h=96, w=96, seed=0):
    return np.random.RandomState(seed).randint(
        0, 255, (h, w, 3)).astype(np.uint8)


class TestEditor:
    def test_full_process_auto_everything(self, editor):
        tile, results, (cond, mask), prompt = editor.process(
            image=_image(), mask=None, prompt="a cat",
            enable_auto_prompt=True, enable_all_generate=True,
            num_samples=1, image_resolution=64, detect_resolution=64,
            ddim_steps=2, seed=0)
        assert len(results) == 1
        assert results[0].shape == (64, 64, 3)
        assert cond.shape[2] == 3          # auto SAM condition was built
        assert "a cat" in prompt

    def test_click_then_edit(self, editor):
        editor.clear_clicks()
        img = _image(seed=3)
        overlay, mask = editor.process_image_click(
            img, 40, 40, True, detect_resolution=64)
        assert overlay.shape[2] == 3
        assert mask.max() in (0, 255)
        _, results, _, _ = editor.process(
            image=img, mask=mask, prompt="dog",
            condition_image=np.zeros((96, 96, 3), np.uint8),
            image_resolution=64, ddim_steps=2, alignment_ratio=0.5, seed=1)
        assert results[0].shape == (64, 64, 3)

    def test_tile_refinement_path(self, editor):
        tile, results, _, _ = editor.process(
            image=_image(seed=4), mask=np.full((96, 96), 255, np.uint8),
            prompt="x", condition_image=np.zeros((96, 96, 3), np.uint8),
            image_resolution=64, ddim_steps=2, alignment_ratio=0.5,
            enable_tile=True, refine_image_resolution=128, seed=2)
        assert len(tile) == 1
        assert tile[0].shape == (128, 128, 3)

    def test_alpha_mixing_path(self, editor):
        _, results, _, _ = editor.process(
            image=_image(seed=5), mask=np.full((96, 96), 255, np.uint8),
            prompt="x", condition_image=np.zeros((96, 96, 3), np.uint8),
            image_resolution=64, ddim_steps=2, use_alpha_mixing=True,
            alignment_ratio=0.5, alpha_weight=0.3, seed=2)
        assert results[0].shape == (64, 64, 3)


class TestTextGuidedEdit:
    def test_remove_small_regions(self):
        from editanything_tpu.perception.grounding import remove_small_regions
        m = np.zeros((32, 32), bool)
        m[4:20, 4:20] = True
        m[10, 10] = False               # 1px hole
        filled, changed = remove_small_regions(m, 400, mode="holes")
        assert changed and filled[10, 10]
        m2 = np.zeros((32, 32), bool)
        m2[4:20, 4:20] = True
        m2[28, 28] = True               # 1px island
        cleaned, changed = remove_small_regions(m2, 10, mode="islands")
        assert changed and not cleaned[28, 28] and cleaned[5, 5]

    def test_prompt2mask_with_fake_detector(self, editor):
        from editanything_tpu.perception.grounding import (
            TextGuidedEditPipeline, prompt2mask)
        img = _image(seed=7)

        def fake_detector(image, text):
            return (np.array([[20.0, 20.0, 70.0, 70.0]]),
                    np.array([0.9]), ["dog head"])

        mask = prompt2mask(fake_detector, editor.sam_predictor, img,
                           "dog head")
        assert mask.shape == (96, 96, 3)
        assert set(np.unique(mask)) <= {0, 255}

        pipe = TextGuidedEditPipeline(editor, fake_detector)
        _, results, _, _ = pipe(
            image=img, mask_prompt="dog head", prompt="cat head",
            condition_image=np.zeros((96, 96, 3), np.uint8),
            image_resolution=64, ddim_steps=2, alignment_ratio=0.5, seed=0)
        assert results[0].shape == (64, 64, 3)


class TestDemos:
    def test_semantic_overlay_render(self):
        from editanything_tpu.apps.demos import (CONFIG_DICT,
                                                 show_semantic_image_label)
        assert len(CONFIG_DICT) == 4
        m1 = np.zeros((64, 64), bool)
        m1[8:30, 8:30] = True
        m2 = np.zeros((64, 64), bool)
        m2[40:60, 40:60] = True
        out = show_semantic_image_label((64, 64),
                                        [(m1, "a dog"), (m2, "a sofa")])
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        assert out[10, 10].any()          # region filled
        assert not out[0, 0].any()        # background black


class TestCrossImageDragPrep:
    def test_crop_masked_region(self):
        from editanything_tpu.pipelines.editor import EditAnythingEditor
        img = np.full((40, 40, 3), 200, np.uint8)
        mask = np.zeros((40, 40), np.uint8)
        mask[10:20, 5:25] = 255
        crop = EditAnythingEditor._crop_masked_region(img, mask)
        assert crop.shape == (10, 20, 3)
        assert (crop == 200).all()        # inside fully kept

    def test_textinv_load_or_stage(self, editor, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        crop = np.full((16, 16, 3), 128, np.uint8)
        # no embedding file: stages the crop
        loaded = editor._load_or_stage_textinv(crop, str(tmp_path / "no.npy"))
        assert not loaded
        assert (tmp_path / "utils/tmp/textinv/img/ref.png").exists()
        # with an embedding file: appends rows to the text table
        d = editor.bundle.text_cfg.hidden_size
        v_before = editor.bundle.text["embeddings"]["token_embedding"][
            "weight"].shape[0]
        emb_path = tmp_path / "emb.npy"
        np.save(emb_path, np.zeros((2, d), np.float32))
        assert editor._load_or_stage_textinv(crop, str(emb_path))
        v_after = editor.bundle.text["embeddings"]["token_embedding"][
            "weight"].shape[0]
        assert v_after == v_before + 2


class TestSemanticMethod:
    def test_editor_semantic(self, editor):
        labels, overlay = editor.semantic(_image(seed=9), top_k=4,
                                          detect_resolution=64)
        assert isinstance(labels, list)
        assert overlay.shape[2] == 3 and overlay.dtype == np.uint8
        for idx, lab in labels:
            assert isinstance(idx, int) and isinstance(lab, str)


class TestImg2Img:
    def test_img2img_strength(self):
        import jax
        from editanything_tpu.pipelines import Img2ImgPipeline, random_bundle
        b = random_bundle(jax.random.PRNGKey(0), tiny=True,
                          controlnet_names=("sam",))
        pipe = Img2ImgPipeline(b, controlnet="sam")
        img = _image(seed=11)
        out = pipe(image=img, prompt="a cat", strength=0.5,
                   image_resolution=64, num_steps=4, seed=0)
        assert out.shape == (1, 64, 64, 3)
        # low strength keeps the input closer than high strength
        from editanything_tpu.utils import resize_image
        ref = resize_image(img, 64).astype(np.float32)
        lo = pipe(image=img, prompt="a cat", strength=0.2,
                  image_resolution=64, num_steps=4, seed=0)
        hi = pipe(image=img, prompt="a cat", strength=1.0,
                  image_resolution=64, num_steps=4, seed=0)
        d_lo = np.abs(lo[0].astype(np.float32) - ref).mean()
        d_hi = np.abs(hi[0].astype(np.float32) - ref).mean()
        assert d_lo < d_hi

    def test_img2img_with_control(self):
        import jax
        from editanything_tpu.pipelines import Img2ImgPipeline, random_bundle
        b = random_bundle(jax.random.PRNGKey(1), tiny=True,
                          controlnet_names=("sam",))
        pipe = Img2ImgPipeline(b, controlnet="sam")
        out = pipe(image=_image(seed=12), prompt="x", strength=0.6,
                   condition_image=np.zeros((96, 96, 3), np.uint8),
                   image_resolution=64, num_steps=3, seed=1)
        assert out.shape == (1, 64, 64, 3)


class TestReferenceReplay:
    """A pickle captured from the ACTUAL reference UI stores all 35 process
    params positionally (annotator/util.py:77-95, replayed as
    model.process(*args, **kwargs) by editany_nogradio.py:14); the CLI must
    map that onto our keyword-only surface."""

    @staticmethod
    def _reference_args(img, mask=None, **over):
        """Positional args in the editany_lora.py:609-644 order, with the
        reference demo's defaults."""
        source = {"image": img, "mask": over.pop("brush_mask", None)} \
            if over.pop("as_dict", False) else img
        vals = dict(
            source_image=source, enable_all_generate=False, mask_image=mask,
            control_scale=0.5, enable_auto_prompt=False, a_prompt="best",
            n_prompt="bad", num_samples=1, image_resolution=64,
            detect_resolution=64, ddim_steps=2, guess_mode=False, scale=9.0,
            seed=5, eta=0.0, enable_tile=False, refine_alignment_ratio=0.95,
            refine_image_resolution=128, alpha_weight=0.5,
            use_scale_map=False, condition_model="EditAnything",
            ref_image=None, attention_auto_machine_weight=1.0,
            gn_auto_machine_weight=1.0, style_fidelity=0.5,
            reference_attn=True, reference_adain=True, ref_prompt=None,
            ref_sam_scale=None, ref_inpaint_scale=None,
            ref_auto_prompt=False, ref_textinv=False, ref_textinv_path=None,
            ref_scale=None)
        vals.update(over)
        from editanything_tpu.apps.cli import REF_PROCESS_PARAMS
        return tuple(vals[k] for k in REF_PROCESS_PARAMS)

    def test_positional_mapping_and_replay(self, editor):
        import pickle

        from editanything_tpu.apps.cli import reference_call_to_kwargs
        img = _image(seed=21)
        mask = np.zeros((96, 96), np.uint8)
        mask[20:70, 20:70] = 255
        blob = pickle.dumps({"args": self._reference_args(img, mask),
                             "kwargs": {}})
        data = pickle.loads(blob)
        kw = reference_call_to_kwargs(data["args"], data["kwargs"])
        assert kw["a_prompt"] == "best" and kw["n_prompt"] == "bad"
        assert kw["seed"] == 5 and kw["ddim_steps"] == 2
        np.testing.assert_array_equal(kw["image"], img)
        np.testing.assert_array_equal(kw["mask"], mask)
        # must also add condition_image (tiny SAM in the fixture is slow
        # but works); replay end-to-end through process()
        _, results, _, _ = editor.process(
            **{**kw, "condition_image": np.zeros((96, 96, 3), np.uint8),
               "alignment_ratio": 0.5})
        assert results[0].shape == (64, 64, 3)

    def test_capture_format_detection(self):
        """Native EA_SAVE_INPUTS captures must NOT be routed through the
        reference mapper (they share kwarg names like a_prompt/seed with
        the reference but carry the native `image` kwarg)."""
        from editanything_tpu.apps.cli import is_reference_capture
        native = {"image": _image(seed=30), "mask": np.zeros((96, 96)),
                  "prompt": "x", "a_prompt": "best", "n_prompt": "bad",
                  "num_samples": 1, "ddim_steps": 2, "seed": 5}
        assert not is_reference_capture((), native)
        assert is_reference_capture(self._reference_args(_image(seed=31)),
                                    {})
        assert is_reference_capture((), {"source_image": _image(seed=32),
                                         "ddim_steps": 2})

    def test_gradio_dicts_and_renames(self):
        from editanything_tpu.apps.cli import reference_call_to_kwargs
        img = _image(seed=22)
        brush = np.zeros((96, 96, 3), np.uint8)
        brush[10:30, 10:30] = 255
        ref_img = _image(seed=23)
        ref_mask = np.full((96, 96, 3), 255, np.uint8)
        args = self._reference_args(
            img, None, as_dict=True, brush_mask=brush,
            ref_image={"image": ref_img, "mask": ref_mask},
            attention_auto_machine_weight=0.7, gn_auto_machine_weight=0.3)
        kw = reference_call_to_kwargs(args)
        np.testing.assert_array_equal(kw["image"], img)
        np.testing.assert_array_equal(kw["mask"], brush[..., 0])
        np.testing.assert_array_equal(kw["ref_image"], ref_img)
        assert kw["ref_mask"].shape == (96, 96, 3)
        assert kw["attention_auto_weight"] == 0.7
        assert kw["gn_auto_weight"] == 0.3
        # eta/condition_model map through 1:1 now; eta=0 does not force
        # the ddim sampler
        assert kw["eta"] == 0.0 and "sampler" not in kw
        assert kw["condition_model"] == "EditAnything"

    def test_kwargs_override(self):
        from editanything_tpu.apps.cli import reference_call_to_kwargs
        args = self._reference_args(_image(seed=24))
        kw = reference_call_to_kwargs(args, {"seed": 99, "ddim_steps": 7})
        assert kw["seed"] == 99 and kw["ddim_steps"] == 7

    def test_all_35_positionals_covered(self):
        """Regression: every one of the reference's 35 process parameters
        (editany_lora.py:609-644, incl. the ref-drag ones) is either mapped
        to a native kwarg or deliberately consumed by the mapper — none is
        silently dropped anymore (round-3 gap)."""
        from editanything_tpu.apps.cli import (REF_PROCESS_PARAMS,
                                               reference_call_to_kwargs)
        img = _image(seed=25)
        ref_img = _image(seed=26)
        args = self._reference_args(
            img, np.zeros((96, 96), np.uint8),
            eta=0.7, condition_model="/tmp/cn.safetensors",
            ref_image={"image": ref_img,
                       "mask": np.full((96, 96, 3), 255, np.uint8)},
            ref_prompt="rp", ref_sam_scale=0.3, ref_inpaint_scale=0.2,
            ref_auto_prompt=True, ref_textinv=True,
            ref_textinv_path="/tmp/e.npy", ref_scale=0.4,
            use_scale_map=True, guess_mode=True, alpha_weight=0.25,
            enable_tile=True, refine_alignment_ratio=0.9,
            refine_image_resolution=256)
        kw = reference_call_to_kwargs(args)
        assert kw["eta"] == 0.7 and kw["sampler"] == "ddim"
        assert kw["condition_model"] == "/tmp/cn.safetensors"
        assert kw["ref_sam_scale"] == 0.3
        assert kw["ref_inpaint_scale"] == 0.2
        assert kw["ref_prompt"] == "rp" and kw["ref_auto_prompt"] is True
        assert kw["ref_textinv"] is True
        assert kw["ref_textinv_path"] == "/tmp/e.npy"
        assert kw["ref_scale"] == 0.4 and kw["use_scale_map"] is True
        assert kw["alpha_weight"] == 0.25 and kw["guess_mode"] is True
        assert kw["enable_tile"] is True
        assert kw["refine_alignment_ratio"] == 0.9
        assert kw["refine_image_resolution"] == 256
        np.testing.assert_array_equal(kw["ref_image"], ref_img)
        # structural guarantee: the mapper consumes all 34 positional
        # names (source_image/mask_image fold into image/mask)
        import inspect
        from editanything_tpu.pipelines.editor import EditAnythingEditor
        sig = set(inspect.signature(
            EditAnythingEditor.process).parameters)
        for k in kw:
            assert k in sig, f"mapped kwarg {k} not accepted by process()"


class TestScaleMapToggle:
    def test_auto_scale_map_from_mask(self, editor):
        """use_scale_map derives 1-mask so the SAM control is zeroed inside
        the edit region (editany_lora.py:829-839)."""
        # random-init ControlNets have zero-init output convs (grafting
        # semantics) -> perturb so the control actually acts
        perturbed = jax.tree.map(lambda x: x + 0.01,
                                 editor.bundle.controlnets["sam"][1])
        editor.bundle.swap_controlnet("sam", perturbed)
        img = _image(seed=13)
        mask = np.zeros((96, 96), np.uint8)
        mask[20:70, 20:70] = 255
        _, with_map, _, _ = editor.process(
            image=img, mask=mask, prompt="x",
            condition_image=np.full((96, 96, 3), 7, np.uint8),
            image_resolution=64, ddim_steps=2, alignment_ratio=0.5,
            use_scale_map=True, control_scale=1.0, seed=4)
        _, without, _, _ = editor.process(
            image=img, mask=mask, prompt="x",
            condition_image=np.full((96, 96, 3), 7, np.uint8),
            image_resolution=64, ddim_steps=2, alignment_ratio=0.5,
            use_scale_map=False, control_scale=1.0, seed=4)
        assert (np.asarray(with_map) != np.asarray(without)).any()
