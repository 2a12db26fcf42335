"""UI-graph tests against the reference template contract
(editany_demo.py:9-466) using a mocked gradio: 3 tabs with three run
buttons all passing the 35-positional parameter list, click/clear wiring,
and every advanced control (eta, condition model, TI toggle/path, ref
pos/content scales, scale map) reaching editor.process."""

import importlib
import sys
import types

import numpy as np
import pytest

import fake_gradio
from editanything_tpu.apps.cli import REF_PROCESS_PARAMS


@pytest.fixture()
def ui(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", fake_gradio)
    fake_gradio.Component.reset()
    import editanything_tpu.apps.ui as ui_mod
    ui_mod = importlib.reload(ui_mod)
    yield ui_mod
    sys.modules.pop("gradio", None)
    importlib.reload(ui_mod)


class StubEditor:
    def __init__(self):
        self.calls = []
        self.click_points = []
        self.click_calls = []

    def process(self, **kwargs):
        self.calls.append(kwargs)
        img = np.zeros((8, 8, 3), np.uint8)
        return [img], [img], [img, img], "used prompt"

    def process_image_click(self, image, x, y, is_foreground,
                            detect_resolution=1024):
        self.click_points.append((x, y, 1 if is_foreground else 0))
        self.click_calls.append((x, y, is_foreground, detect_resolution))
        return image, np.ones(image.shape[:2], np.uint8) * 255

    def clear_clicks(self):
        self.click_points = []


def _handlers(event="click"):
    return [h for h in fake_gradio.Component.handlers
            if h["event"] == event and h["fn"] is not None]


def _run_handlers():
    """The three run buttons: handlers with the 35-input list."""
    return [h for h in _handlers() if len(h["inputs"]) == 34]


def _values_for(ui_mod, handler, overrides):
    """One value per wired input component, keyed by REF param order."""
    vals = []
    for name, comp in zip(REF_PROCESS_PARAMS, handler["inputs"]):
        if name in overrides:
            vals.append(overrides[name])
        elif isinstance(comp, fake_gradio.State):
            vals.append(comp.value)
        elif isinstance(comp, (fake_gradio.Checkbox,)):
            vals.append(bool(comp.value))
        elif isinstance(comp, (fake_gradio.Slider, fake_gradio.Number)):
            vals.append(comp.value if comp.value is not None else 0)
        elif isinstance(comp, fake_gradio.Textbox):
            vals.append(comp.value or "")
        else:
            vals.append(None)
    return vals


class TestTemplateGraph:
    def test_three_tabs_three_run_buttons(self, ui):
        editor = StubEditor()
        ui.create_demo(editor)
        tabs = [c for c in fake_gradio.Component.registry
                if isinstance(c, fake_gradio.Tab)]
        assert len(tabs) == 3
        runs = _run_handlers()
        assert len(runs) == 3, \
            "Click/Brush/All-region tabs each need a run button with the " \
            "35-positional input list (editany_demo.py:280-452)"
        # 34 wired inputs + the enable_all_generate State == 35 params
        assert len(REF_PROCESS_PARAMS) == 34
        # exactly one run wiring passes enable_all_generate=True state
        all_gen = [h["inputs"][1].value for h in runs]
        assert sorted(all_gen) == [False, False, True]

    def test_every_control_reaches_process(self, ui):
        editor = StubEditor()
        ui.create_demo(editor)
        brush = [h for h in _run_handlers()
                 if h["inputs"][1].value is False][0]
        img = np.zeros((16, 16, 3), np.uint8)
        msk = np.zeros((16, 16), np.uint8)
        overrides = {
            "source_image": {"image": img, "mask": msk},
            "mask_image": None,
            "control_scale": 0.7, "a_prompt": "pos", "n_prompt": "neg",
            "num_samples": 3, "image_resolution": 512,
            "detect_resolution": 256, "ddim_steps": 11, "guess_mode": True,
            "scale": 7.5, "seed": 42, "eta": 0.8, "enable_tile": False,
            "refine_alignment_ratio": 0.9, "refine_image_resolution": 1024,
            "alpha_weight": 0.0, "use_scale_map": True,
            "condition_model": "EditAnything",
            "ref_image": None,
            "attention_auto_machine_weight": 0.5,
            "gn_auto_machine_weight": 0.25, "style_fidelity": 0.1,
            "reference_attn": True, "reference_adain": False,
            "ref_prompt": "refp", "ref_sam_scale": 0.3,
            "ref_inpaint_scale": 0.2, "ref_auto_prompt": False,
            "ref_textinv": True, "ref_textinv_path": "/tmp/emb.npy",
            "ref_scale": 0.4,
        }
        brush["fn"](*_values_for(ui, brush, overrides))
        assert len(editor.calls) == 1
        kw = editor.calls[0]
        assert kw["control_scale"] == 0.7
        assert kw["eta"] == 0.8 and kw["sampler"] == "ddim"
        assert kw["condition_model"] == "EditAnything"
        assert kw["use_scale_map"] is True
        assert kw["ref_textinv"] is True
        assert kw["ref_textinv_path"] == "/tmp/emb.npy"
        assert kw["ref_sam_scale"] == 0.3
        assert kw["ref_inpaint_scale"] == 0.2
        assert kw["attention_auto_weight"] == 0.5
        assert kw["gn_auto_weight"] == 0.25
        assert kw["ddim_steps"] == 11 and kw["seed"] == 42
        assert kw["guess_mode"] is True
        # the brush mask flows from the sketch dict
        np.testing.assert_array_equal(kw["mask"], msk)

    def test_click_select_and_clear_wiring(self, ui):
        editor = StubEditor()
        ui.create_demo(editor)
        selects = _handlers("select")
        assert len(selects) == 1
        # select inputs: origin_image, point_prompt, clicked_points, res
        assert len(selects[0]["inputs"]) == 4
        img = np.zeros((16, 16, 3), np.uint8)
        evt = fake_gradio.SelectData(index=(5, 6))
        overlay, pts, mask = selects[0]["fn"](
            img, "Foreground Point", [], 256, evt)
        assert pts == [(5, 6, 1)]
        assert editor.click_calls[0] == (5, 6, True, 256)
        # accumulating a second click keeps the first via the state
        _, pts2, _ = selects[0]["fn"](img, "Background Point", pts, 256,
                                      fake_gradio.SelectData(index=(1, 2)))
        assert pts2 == [(5, 6, 1), (1, 2, 0)]

        # clear-points button resets the state (the round-3 dead button)
        clears = [h for h in _handlers() if len(h["inputs"]) == 1
                  and len(h["outputs"]) == 3]
        assert clears, "clear_button_click must be wired"
        out = clears[0]["fn"](img)
        assert out[1] == [] and out[2] is None
        # reset-image button clears everything
        resets = [h for h in _handlers() if len(h["inputs"]) == 0
                  and len(h["outputs"]) == 5]
        assert resets, "clear_button_image must be wired"
        assert resets[0]["fn"]() == (None, [], None, None, None)

    def test_upload_snapshots_origin(self, ui):
        ui.create_demo(StubEditor())
        uploads = _handlers("upload")
        assert len(uploads) == 1
        img = np.ones((4, 4, 3), np.uint8)
        snap = uploads[0]["fn"](img)
        assert snap is not img               # copy, not alias
        np.testing.assert_array_equal(snap, img)

    def test_combined_app_two_tabs(self, ui):
        editors = {"Edit Anything": StubEditor(), "Beauty": StubEditor()}
        ui.create_combined_app(editors)
        items = [c for c in fake_gradio.Component.registry
                 if isinstance(c, fake_gradio.TabItem)]
        assert len(items) == 2
        assert len(_run_handlers()) == 6     # 3 run buttons per tab
