"""End-to-end tests for the runnable DreamBooth / textual-inversion
training programs (tiny models, tmp dirs) — the reference's script surface
(tools/train_dreambooth_inpaint.py:405, utils/texutal_inversion.py:563)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from editanything_tpu.models import config as C
from editanything_tpu.models import unet as UN
from editanything_tpu.pipelines import random_bundle
from editanything_tpu.train.train_dreambooth import (generate_class_images,
                                                     train as db_train)
from editanything_tpu.train.train_ti import train_textual_inversion


def _write_images(directory, n=2, size=48, seed=0):
    os.makedirs(directory, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)
                        ).save(os.path.join(directory, f"img_{i}.png"))


def _tiny_db_bundle(seed=0):
    """Tiny bundle with the 9-ch inpainting UNet DreamBooth trains."""
    bundle = random_bundle(jax.random.PRNGKey(seed), tiny=True,
                           controlnet_names=())
    ucfg = dataclasses.replace(bundle.unet_cfg, in_channels=9)
    return dataclasses.replace(
        bundle, unet_cfg=ucfg,
        unet=UN.init_unet(jax.random.PRNGKey(seed), ucfg, bundle.dtype))


class TestTextualInversionProgram:
    def test_end_to_end(self, tmp_path):
        data = str(tmp_path / "img")
        out = str(tmp_path / "learned_embeds.npy")
        _write_images(data, n=2)
        bundle = random_bundle(jax.random.PRNGKey(0), tiny=True,
                               controlnet_names=())
        v0 = bundle.text["embeddings"]["token_embedding"]["weight"].shape[0]
        state, pids = train_textual_inversion(
            data_dir=data, output_path=out, bundle=bundle,
            num_vectors=2, max_steps=3, batch_size=2, resolution=32,
            save_steps=10, seed=0)
        assert int(state.step) == 3
        embeds = np.load(out)
        assert embeds.shape == (2, bundle.text_cfg.hidden_size)
        # placeholder registered: prompts resolve to the appended rows
        ids = bundle.tokenizer.encode("a photo of a <new-obj>")
        assert ids[-2:] == pids == [v0, v0 + 1]
        # only the placeholder rows moved vs their initializer value
        table = np.asarray(state.embeddings)
        init_vec = table[bundle.tokenizer.encode("mark")[0]]
        assert np.abs(embeds - init_vec[None]).max() > 0
        # the trained table was written back into the live bundle
        np.testing.assert_array_equal(
            np.asarray(
                bundle.text["embeddings"]["token_embedding"]["weight"]),
            table)

    def test_resume(self, tmp_path):
        data = str(tmp_path / "img")
        out = str(tmp_path / "emb.npy")
        run = str(tmp_path / "run")
        _write_images(data, n=1)
        b1 = random_bundle(jax.random.PRNGKey(0), tiny=True,
                           controlnet_names=())
        s1, _ = train_textual_inversion(
            data_dir=data, output_path=out, bundle=b1, num_vectors=2,
            max_steps=2, batch_size=1, resolution=32, save_steps=10,
            out_dir=run, ckpt_every=2, seed=0)
        assert int(s1.step) == 2
        b2 = random_bundle(jax.random.PRNGKey(0), tiny=True,
                           controlnet_names=())
        s2, _ = train_textual_inversion(
            data_dir=data, output_path=out, bundle=b2, num_vectors=2,
            max_steps=4, batch_size=1, resolution=32, save_steps=10,
            out_dir=run, ckpt_every=2, seed=0)
        assert int(s2.step) == 4
        # resumed from the step-2 checkpoint, not from scratch
        np.testing.assert_array_equal(
            np.asarray(s1.embeddings).shape, np.asarray(s2.embeddings).shape)


class TestDreamBoothProgram:
    def test_class_image_generation(self, tmp_path):
        bundle = _tiny_db_bundle()
        class_dir = str(tmp_path / "class")
        n = generate_class_images(
            bundle, class_dir=class_dir, class_prompt="a photo of a dog",
            num_class_images=3, resolution=32, num_steps=2, batch_size=2,
            seed=0)
        assert n == 3
        assert len(os.listdir(class_dir)) == 3
        # idempotent: already full -> generates nothing
        assert generate_class_images(
            bundle, class_dir=class_dir, class_prompt="a photo of a dog",
            num_class_images=3, resolution=32, num_steps=2) == 0

    def test_train_with_prior_preservation(self, tmp_path):
        bundle = _tiny_db_bundle()
        inst = str(tmp_path / "inst")
        cls = str(tmp_path / "class")
        outd = str(tmp_path / "out")
        _write_images(inst, n=2)
        p0 = jax.tree.map(np.copy, bundle.unet)
        state = db_train(
            instance_data_dir=inst, instance_prompt="a photo of a cat",
            output_dir=outd, bundle=bundle, class_data_dir=cls,
            class_prompt="a photo of a dog", with_prior_preservation=True,
            prior_loss_weight=1.0, num_class_images=1, class_gen_steps=2,
            batch_size=1, lr=1e-3, max_steps=2, resolution=32,
            ckpt_every=10, log_every=1, seed=0)
        assert int(state.step) == 2
        assert len(os.listdir(cls)) == 1
        moved = any(
            np.abs(np.asarray(a) - np.asarray(b)).max() > 0
            for a, b in zip(jax.tree.leaves(p0),
                            jax.tree.leaves(state.unet_params)))
        assert moved
        assert os.path.isdir(os.path.join(outd, "unet"))
        assert os.path.exists(os.path.join(outd, "metrics.jsonl"))

    def test_train_lora(self, tmp_path):
        bundle = _tiny_db_bundle()
        inst = str(tmp_path / "inst")
        outd = str(tmp_path / "out")
        _write_images(inst, n=1)
        p0 = jax.tree.map(np.copy, bundle.unet)
        state = db_train(
            instance_data_dir=inst, instance_prompt="a photo of a cat",
            output_dir=outd, bundle=bundle, use_lora=True, lora_rank=2,
            batch_size=1, lr=1e-2, max_steps=2, resolution=32,
            ckpt_every=10, seed=0)
        assert int(state.step) == 2
        # the frozen UNet did not move; LoRA ups did
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(bundle.unet)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert any(float(jnp.abs(d["up"]).max()) > 0
                   for d in state.deltas.values())
        assert os.path.isdir(os.path.join(outd, "lora_deltas"))


class TestEditorTextinvFlow:
    def test_stage_train_edit(self, tmp_path):
        """The cross-image-drag TI loop (editany_lora.py:732-745): stage
        the masked ref crop -> train -> edit with the embedding."""
        from editanything_tpu.pipelines import EditAnythingEditor
        bundle = random_bundle(jax.random.PRNGKey(0), tiny=True,
                               controlnet_names=("sam", "inpaint"))
        editor = EditAnythingEditor(bundle, extra_inpaint=True,
                                    tile_control="none")
        editor.textinv_stage_dir = str(tmp_path / "staged")
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        mask = (np.mgrid[0:64, 0:64][0] > 32).astype(np.uint8) * 255
        cond = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        ref = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)

        # 1. no embedding -> the ref crop is staged
        kwargs = dict(image=img, mask=mask, prompt="a photo of a cat",
                      condition_image=cond, num_samples=1,
                      image_resolution=64, ddim_steps=2, seed=0,
                      ref_image=ref, ref_mask=mask, ref_textinv=True,
                      ref_textinv_path=str(tmp_path / "missing.npy"))
        _, results, _, _ = editor.process(**kwargs)
        assert results[0].shape == (64, 64, 3)
        assert os.path.exists(os.path.join(editor.textinv_stage_dir,
                                           "ref.png"))

        # 2. train on the staged crop
        out = str(tmp_path / "learned.npy")
        editor.train_staged_textinv(out, max_steps=2, num_vectors=2,
                                    batch_size=1, resolution=32)
        assert os.path.exists(out)
        # the placeholder now resolves in prompts
        ph_ids = bundle.tokenizer.placeholders["<new-obj>"]
        assert bundle.tokenizer.encode("a photo of a <new-obj>")[-2:] \
            == ph_ids

        # 3. edit again with the learned embedding
        v_before = bundle.text["embeddings"]["token_embedding"][
            "weight"].shape[0]
        kwargs["ref_textinv_path"] = out
        kwargs["prompt"] = "a photo of a <new-obj>"
        _, results, _, _ = editor.process(**kwargs)
        assert results[0].shape == (64, 64, 3)
        v_after = bundle.text["embeddings"]["token_embedding"][
            "weight"].shape[0]
        assert v_after == v_before + 2   # load appended the learned rows
