"""ldm/cldm checkpoint ingestion dress rehearsal.

The last weight-intake surface: the reference's training-side `.ckpt`
format (/root/reference/cldm/model.py:12-28, tools/tool_add_control_sd21.py
:27-50, tool_transfer_control.py:35-58,
tools/convert_controlnet_to_diffusers.py:80-91, and the open_clip text
tower ldm/modules/encoders/modules.py:134-193).

Strategy against circularity: the key maps in checkpoints/ldm.py are
bidirectional, so a bug shared by both directions would cancel in a pure
round trip. tests/ldm_replica.py therefore provides torch modules with the
GENUINE ldm module naming — key-set/shape equality against their
state_dict() pins the maps to the real layout, torch-forward parity pins
the numerics, and the e2e loads a synthesized full cldm .ckpt from disk.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from editanything_tpu.checkpoints import ldm as LDM  # noqa: E402
from editanything_tpu.checkpoints.convert import (  # noqa: E402
    clip_text_to_tree, diffusers_to_tree, tree_to_diffusers)
from editanything_tpu.models import clip_text as CT  # noqa: E402
from editanything_tpu.models import config as C  # noqa: E402
from editanything_tpu.models import controlnet as CN  # noqa: E402
from editanything_tpu.models import unet as U  # noqa: E402

import ldm_replica as LR  # noqa: E402
import sd_replica as R  # noqa: E402
from test_sd_parity import _randomize  # noqa: E402

UNET_CFG = C.UNetConfig(
    block_out_channels=(32, 64), layers_per_block=2,
    cross_attention_dim=48, attention_head_dim=(2, 2),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    norm_num_groups=8)
CN_CFG = C.ControlNetConfig(unet=UNET_CFG,
                            conditioning_embedding_channels=(4, 8, 8, 8))
VAE_CFG = C.VAEConfig(block_out_channels=(8, 8, 8, 16), layers_per_block=1,
                      latent_channels=4, norm_num_groups=4)


def _np(sd):
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _ldm_unet():
    torch.manual_seed(0)
    return _randomize(LR.LDMUNetReplica(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=2,
        context_dim=48, heads=2, groups=8), seed=11)


def _diff_unet():
    torch.manual_seed(0)
    return _randomize(R.UNetReplica(
        block_out_channels=(32, 64), layers_per_block=2, context_dim=48,
        heads=(2, 2), groups=8), seed=21)


# ---------------------------------------------------------------------------
# 1. key-set/shape parity against the genuine ldm naming
# ---------------------------------------------------------------------------

def _assert_same_layout(mapped: dict, oracle: dict, what: str):
    mk, ok = set(mapped), set(oracle)
    assert mk == ok, (f"{what}: missing={sorted(ok - mk)[:8]} "
                      f"extra={sorted(mk - ok)[:8]}")
    for k in ok:
        assert tuple(np.shape(mapped[k])) == tuple(oracle[k].shape), \
            (what, k, np.shape(mapped[k]), tuple(oracle[k].shape))


def test_unet_keymap_matches_ldm_naming():
    diff_sd = _np(_diff_unet().state_dict())
    ldm_sd = _np(_ldm_unet().state_dict())
    _assert_same_layout(LDM.diffusers_unet_to_ldm(diff_sd, 2), ldm_sd,
                        "diffusers->ldm unet")
    _assert_same_layout(LDM.ldm_unet_to_diffusers(ldm_sd), diff_sd,
                        "ldm->diffusers unet")


def test_controlnet_keymap_matches_cldm_naming():
    diff = _randomize(R.ControlNetReplica(
        _diff_unet(), cond_chans=(4, 8, 8, 8), block_out_channels=(32, 64),
        layers_per_block=2), seed=5)
    diff_sd = _np(diff.state_dict_standalone())
    ldm_sd = _np(_randomize(LR.LDMControlNetReplica(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=2,
        context_dim=48, heads=2, groups=8, hint_chans=(4, 8, 8, 8)),
        seed=6).state_dict())
    _assert_same_layout(LDM.diffusers_controlnet_to_ldm(diff_sd, 2), ldm_sd,
                        "diffusers->cldm controlnet")
    _assert_same_layout(LDM.ldm_controlnet_to_diffusers(ldm_sd), diff_sd,
                        "cldm->diffusers controlnet")


def test_vae_keymap_matches_ldm_naming():
    diff_sd = _np(_randomize(R.VAEReplica(chans=(8, 8, 8, 16), layers=1,
                                          z=4, groups=4),
                             seed=7).state_dict())
    ldm_sd = _np(_randomize(LR.LDMVAEReplica(chans=(8, 8, 8, 16), layers=1,
                                             z=4, groups=4),
                            seed=8).state_dict())
    _assert_same_layout(LDM.diffusers_vae_to_ldm(diff_sd), ldm_sd,
                        "diffusers->ldm vae")
    _assert_same_layout(LDM.ldm_vae_to_diffusers(ldm_sd), diff_sd,
                        "ldm->diffusers vae")


# ---------------------------------------------------------------------------
# 2. numeric parity: ldm-layout weights through our models == torch
# ---------------------------------------------------------------------------

def test_ldm_unet_weights_numeric_parity():
    """Load the SAME ldm-layout weights into (a) the torch diffusers
    replica via the key map and (b) our UNet via ldm_to_tree; forwards
    must agree."""
    ldm_m = _ldm_unet()
    ldm_sd = _np(ldm_m.state_dict())
    torch_m = R.UNetReplica(block_out_channels=(32, 64), layers_per_block=2,
                            context_dim=48, heads=(2, 2), groups=8)
    torch_m.load_state_dict(
        {k: torch.tensor(v)
         for k, v in LDM.ldm_unet_to_diffusers(ldm_sd).items()},
        strict=True)
    torch_m.eval()

    trees = LDM.ldm_to_tree(
        {"model.diffusion_model." + k: v for k, v in ldm_sd.items()})
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(1, 5, 48).astype(np.float32)
    with torch.no_grad():
        ref = torch_m(torch.tensor(x.transpose(0, 3, 1, 2)),
                      torch.tensor([7]), torch.tensor(ctx))
    ours = U.apply(trees["unet"], UNET_CFG, jnp.asarray(x),
                   jnp.asarray([7]), jnp.asarray(ctx))
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
        rtol=2e-4, atol=2e-4)


def test_openclip_tower_numeric_parity():
    """Penultimate-layer semantics + in_proj split: our 2-layer tree from a
    3-resblock open_clip tower must match encode_penultimate exactly."""
    torch.manual_seed(4)
    m = LR.LDMOpenCLIPTextReplica(vocab=100, d=32, layers=3, heads=4,
                                  ctx=8).eval()
    sd = _np(m.state_dict())
    tree = clip_text_to_tree(LDM.openclip_text_to_hf(sd, num_layers=2))
    tcfg = C.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=128,
        num_layers=2, num_heads=4, max_position_embeddings=8,
        hidden_act="gelu", layer_skip=0)
    toks = np.array([[3, 14, 15, 9, 2, 6, 5, 1]], np.int32)
    ref = m.encode_penultimate(torch.tensor(toks, dtype=torch.long))
    ours = CT.apply(tree, tcfg, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=2e-5, atol=2e-5)
    # the full-tower layer count is auto-detected as penultimate by
    # ldm_to_tree (n_resblocks - 1)
    trees = LDM.ldm_to_tree(
        {"cond_stage_model.model." + k: v for k, v in sd.items()})
    assert trees["text_layout"] == "openclip"
    assert set(trees["text"]["encoder"]["layers"]) == {"0", "1"}


# ---------------------------------------------------------------------------
# 3. file-level e2e: full cldm .ckpt -> load_ldm_bundle -> 2-step edit
# ---------------------------------------------------------------------------

TINY_YAML = """
model:
  target: cldm.cldm.ControlLDM
  params:
    linear_start: 0.00085
    linear_end: 0.012
    timesteps: 1000
    scale_factor: 0.18215
    sd_locked: true
    unet_config:
      target: cldm.cldm.ControlledUnetModel
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 32
        channel_mult: [1, 2]
        num_res_blocks: 2
        context_dim: 48
        num_heads: 2
    first_stage_config:
      target: ldm.models.autoencoder.AutoencoderKL
      params:
        ddconfig:
          z_channels: 4
          ch: 8
          ch_mult: [1, 1, 1, 2]
          num_res_blocks: 1
    cond_stage_config:
      target: ldm.modules.encoders.modules.FrozenOpenCLIPEmbedder
      params:
        layer: penultimate
"""


@pytest.fixture(scope="module")
def cldm_ckpt(tmp_path_factory):
    """A full cldm-layout checkpoint on disk, synthesized from the torch
    replicas (diffusers-side weights through the inverse maps — whose
    correctness the layout tests above pin — plus a genuine open_clip text
    tower), with the non-module keys real checkpoints carry."""
    d = tmp_path_factory.mktemp("cldm")
    unet = _diff_unet()
    cn = _randomize(R.ControlNetReplica(
        _diff_unet(), cond_chans=(4, 8, 8, 8), block_out_channels=(32, 64),
        layers_per_block=2), seed=31)
    vae = _randomize(R.VAEReplica(chans=(8, 8, 8, 16), layers=1, z=4,
                                  groups=4), seed=32)
    torch.manual_seed(33)

    from editanything_tpu.text.tokenizer import tiny_tokenizer
    tok = tiny_tokenizer(context_length=16)
    text = LR.LDMOpenCLIPTextReplica(vocab=len(tok.encoder), d=48, layers=3,
                                     heads=4, ctx=16).eval()

    sd = {}
    for k, v in LDM.diffusers_unet_to_ldm(_np(unet.state_dict()), 2).items():
        sd["model.diffusion_model." + k] = v
    for k, v in LDM.diffusers_controlnet_to_ldm(
            _np(cn.state_dict_standalone()), 2).items():
        sd["control_model." + k] = v
    for k, v in LDM.diffusers_vae_to_ldm(_np(vae.state_dict())).items():
        sd["first_stage_model." + k] = v
    for k, v in _np(text.state_dict()).items():
        sd["cond_stage_model.model." + k] = v
    # non-module keys real ckpts carry (schedule buffers, EMA bookkeeping)
    sd["model.betas"] = np.linspace(1e-4, 2e-2, 10).astype(np.float32)
    sd["model.alphas_cumprod"] = np.linspace(1, 0.1, 10).astype(np.float32)
    sd["model_ema.decay"] = np.asarray(0.9999, np.float32)
    sd["model_ema.num_updates"] = np.asarray(100, np.int64)

    ckpt = str(d / "tiny_cldm.ckpt")
    torch.save({"state_dict": {k: torch.tensor(np.asarray(v))
                               for k, v in sd.items()},
                "global_step": 1234}, ckpt)
    yaml_path = str(d / "cldm_tiny.yaml")
    with open(yaml_path, "w") as f:
        f.write(TINY_YAML)
    parts = {"unet": _np(unet.state_dict()),
             "cn": _np(cn.state_dict_standalone()),
             "vae": _np(vae.state_dict()),
             "text": _np(text.state_dict())}
    return ckpt, yaml_path, tok, parts, sd


TCFG = None  # filled per-test from the tokenizer


def _tiny_text_cfg(tok):
    return C.CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=48, intermediate_size=192,
        num_layers=2, num_heads=4, max_position_embeddings=16,
        hidden_act="gelu", layer_skip=0, eos_token_id=tok.eos_id)


def test_load_ldm_bundle_edit_matches_golden(cldm_ckpt):
    ckpt, yaml_path, tok, parts, _ = cldm_ckpt
    from editanything_tpu.pipelines import EditPipeline
    from editanything_tpu.pipelines.bundle import ModelBundle

    bundle, cfgs = LDM.load_ldm_bundle(
        yaml_path, ckpt, tokenizer=tok, control_name="sam",
        dtype=jnp.float32,
        overrides={"unet": UNET_CFG, "vae": VAE_CFG,
                   "text": _tiny_text_cfg(tok),
                   "controlnet": CN_CFG})
    assert cfgs["schedule"].prediction_type == "epsilon"
    assert "sam" in bundle.controlnets

    golden = ModelBundle(
        unet_cfg=UNET_CFG, vae_cfg=VAE_CFG, text_cfg=_tiny_text_cfg(tok),
        unet=diffusers_to_tree(parts["unet"], dtype=jnp.float32),
        vae=diffusers_to_tree(parts["vae"], dtype=jnp.float32),
        text=clip_text_to_tree(
            LDM.openclip_text_to_hf(parts["text"], 2), dtype=jnp.float32),
        tokenizer=tok,
        controlnets={"sam": (CN_CFG, diffusers_to_tree(
            parts["cn"], dtype=jnp.float32))},
        dtype=jnp.float32)

    rng = np.random.RandomState(0)
    kw = dict(image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
              mask=(np.mgrid[0:64, 0:64][0] > 32).astype(np.uint8) * 255,
              prompt="a photo of a cat",
              condition_image=rng.randint(0, 255, (64, 64, 3)
                                          ).astype(np.uint8),
              num_samples=1, image_resolution=64, num_steps=2, seed=3)
    out = EditPipeline(bundle, controls=("sam",))(**kw)
    out_g = EditPipeline(golden, controls=("sam",))(**kw)
    np.testing.assert_array_equal(out, out_g)


def test_ldm_roundtrip_to_diffusers(cldm_ckpt):
    """ldm -> tree -> diffusers round trip returns the original diffusers
    state dict bit-exactly (tools/convert_controlnet_to_diffusers.py's
    output contract)."""
    ckpt, _, _, parts, sd = cldm_ckpt
    conv = LDM.cldm_controlnet_to_diffusers_sd(ckpt)
    assert set(conv) == set(parts["cn"])
    for k in conv:
        np.testing.assert_array_equal(np.asarray(conv[k]),
                                      np.asarray(parts["cn"][k]), err_msg=k)
    # and through our tree: tree_to_diffusers(diffusers_to_tree(x)) == x
    tree = diffusers_to_tree(conv)
    back = tree_to_diffusers(tree)
    assert set(back) == set(conv)
    for k in back:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(conv[k]), err_msg=k)


def test_extract_ema(cldm_ckpt):
    """model_ema.* buffers (dots stripped per ldm/modules/ema.py naming)
    win over the live weights when extract_ema=True."""
    _, _, _, _, sd = cldm_ckpt
    sd = dict(sd)
    ema_vals = {}
    for k in list(sd):
        if k.startswith("model.diffusion_model."):
            flat = k[len("model."):].replace(".", "")
            sd["model_ema." + flat] = np.asarray(sd[k]) + 1.0
            ema_vals[k] = sd["model_ema." + flat]
    live = LDM.ldm_to_tree(sd)["unet"]
    ema = LDM.ldm_to_tree(sd, extract_ema=True)["unet"]
    la = jax.tree.leaves(live)
    ea = jax.tree.leaves(ema)
    assert len(la) == len(ea) and len(la) > 50
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(la, ea)]
    assert all(abs(d - 1.0) < 1e-5 for d in diffs)


def test_add_control_grafts_from_diffusion(cldm_ckpt):
    """tool_add_control semantics: control_model encoder keys COPIED from
    model.diffusion_model, zero convs zero, hint stack fresh."""
    _, _, _, _, full_sd = cldm_ckpt
    sd_plain = {k: v for k, v in full_sd.items()
                if not k.startswith("control_model.")}
    out = LDM.add_control(sd_plain, hint_channels=3)
    ctrl = {k[len("control_model."):]: v for k, v in out.items()
            if k.startswith("control_model.")}
    assert ctrl, "no control branch added"
    copied = 0
    for k, v in ctrl.items():
        src = "model.diffusion_model." + k
        if src in sd_plain:
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(sd_plain[src]))
            copied += 1
    assert copied > 50
    for i in (0, 3):
        np.testing.assert_array_equal(
            np.asarray(ctrl[f"zero_convs.{i}.0.weight"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(ctrl["middle_block_out.0.weight"]), 0.0)
    # the zero TAIL of the hint stack is zero, interior convs are not
    np.testing.assert_array_equal(
        np.asarray(ctrl["input_hint_block.14.weight"]), 0.0)
    assert np.abs(np.asarray(ctrl["input_hint_block.0.weight"])).max() > 0
    # the grafted branch loads and runs (fresh hint stack has the real
    # cldm channel ladder 16/32/96/256, cldm.py:147-163)
    tree = LDM.ldm_to_tree(out)["controlnet"]
    cfg_default_hint = C.ControlNetConfig(unet=UNET_CFG)
    res_down, res_mid = CN.apply(
        jax.tree.map(lambda x: x.astype(jnp.float32), tree),
        cfg_default_hint,
        jnp.zeros((1, 8, 8, 4)), jnp.asarray([5]),
        jnp.zeros((1, 5, 48)), jnp.zeros((1, 64, 64, 3)),
        conditioning_scale=1.0)
    assert len(res_down) == 6  # conv_in + L0(2 res + down) + L1(2 res)


def test_transfer_control_offset_semantics():
    base = {"model.diffusion_model.w": np.asarray([1.0, 2.0]),
            "first_stage_model.v": np.asarray([5.0]),
            "cond_stage_model.model.t": np.asarray([7.0])}
    with_control = dict(base)
    with_control["control_model.w"] = np.asarray([1.5, 2.5])
    new_base = {"model.diffusion_model.w": np.asarray([2.0, 1.0]),
                "first_stage_model.v": np.asarray([9.0]),
                "cond_stage_model.model.t": np.asarray([8.0])}
    out = LDM.transfer_control(base, with_control, new_base)
    # control key offset: control + (new - old)
    np.testing.assert_allclose(out["control_model.w"], [2.5, 1.5])
    # plain diffusion key replaced via the same offset rule (p==base here
    # so it lands exactly on the new base)
    np.testing.assert_allclose(out["model.diffusion_model.w"], [2.0, 1.0])
    # first/cond stage taken verbatim from the new base
    np.testing.assert_allclose(out["first_stage_model.v"], [9.0])
    np.testing.assert_allclose(out["cond_stage_model.model.t"], [8.0])


def test_surgery_cli_file_roundtrip(cldm_ckpt, tmp_path):
    """The add-control / convert-to-diffusers subcommands consume and
    produce real files (the reference tools' CLI surface)."""
    from editanything_tpu.apps.cli import main
    ckpt, _, _, parts, full_sd = cldm_ckpt
    # strip the control branch -> a plain SD ckpt file
    plain = {k: torch.tensor(np.asarray(v)) for k, v in full_sd.items()
             if not k.startswith("control_model.")}
    sd_path = str(tmp_path / "sd_plain.ckpt")
    torch.save({"state_dict": plain}, sd_path)

    grafted = str(tmp_path / "cldm_grafted.ckpt")
    main(["add-control", "--input", sd_path, "--output", grafted])
    out_sd = {k: v.numpy() for k, v in
              torch.load(grafted, weights_only=False)["state_dict"].items()}
    assert any(k.startswith("control_model.input_hint_block") for k in out_sd)
    np.testing.assert_array_equal(
        out_sd["control_model.input_blocks.1.0.in_layers.0.weight"],
        np.asarray(full_sd[
            "model.diffusion_model.input_blocks.1.0.in_layers.0.weight"]))

    conv = str(tmp_path / "cn_diffusers.safetensors")
    main(["convert-to-diffusers", "--input", ckpt, "--output", conv])
    from safetensors.numpy import load_file
    got = load_file(conv)
    assert set(got) == set(parts["cn"])

    transferred = str(tmp_path / "transferred.ckpt")
    main(["transfer-control", "--base", sd_path,
          "--base-with-control", ckpt, "--new-base", sd_path,
          "--output", transferred])
    tr = torch.load(transferred, weights_only=False)["state_dict"]
    np.testing.assert_allclose(
        tr["control_model.input_blocks.1.0.in_layers.0.weight"].numpy(),
        np.asarray(full_sd[
            "control_model.input_blocks.1.0.in_layers.0.weight"]),
        rtol=1e-6)


def test_hf_layout_sd15_ckpt(cldm_ckpt):
    """SD1.x checkpoints carry the HF CLIP tower under
    cond_stage_model.transformer.* — detected and converted."""
    _, _, tok, _, _ = cldm_ckpt
    from test_load_e2e import _hf_clip_text
    hf = _hf_clip_text(len(tok.encoder))
    sd = {"cond_stage_model.transformer." + k: v
          for k, v in _np(hf.state_dict()).items()}
    trees = LDM.ldm_to_tree(sd)
    assert trees["text_layout"] == "hf"
    assert trees["text"] is not None
    toks = np.array([[1, 2, 3, 4, 5, 6, 7, 0]], np.int32)
    tcfg = C.CLIPTextConfig(
        vocab_size=len(tok.encoder), hidden_size=48, intermediate_size=96,
        num_layers=2, num_heads=4, max_position_embeddings=16)
    with torch.no_grad():
        ref = hf(torch.tensor(toks, dtype=torch.long)).last_hidden_state
    ours = CT.apply(trees["text"], tcfg, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=2e-5, atol=2e-5)
