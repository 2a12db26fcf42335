"""End-to-end mini training run: data -> steps -> checkpoints -> resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from editanything_tpu.ops import rle as R


@pytest.fixture()
def data_dir(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        img = rng.randint(0, 255, (80, 96, 3), np.uint8)
        Image.fromarray(img).save(tmp_path / f"im{i}.jpg")
        masks = []
        for j in range(3):
            m = np.zeros((80, 96), np.uint8)
            y, x = rng.randint(0, 60), rng.randint(0, 70)
            m[y:y + 20, x:x + 20] = 1
            masks.append({"segmentation": R.encode(m)})
        with open(tmp_path / f"im{i}.json", "w") as f:
            json.dump({"image": {"height": 80, "width": 96},
                       "annotations": masks}, f)
        lines.append(repr({"target": f"im{i}.jpg", "source": f"im{i}.json",
                           "prompt": f"a photo of a cat {i}"}))
    (tmp_path / "data.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


class TestTrainLoop:
    def test_train_and_resume(self, data_dir, tmp_path):
        from editanything_tpu.pipelines import random_bundle
        from editanything_tpu.train.train_controlnet import train

        bundle = random_bundle(jax.random.PRNGKey(0), tiny=True,
                               controlnet_names=("sam",))
        out = str(tmp_path / "run")
        state = train(data_path=str(data_dir),
                      txt_path=str(data_dir / "data.txt"),
                      out_dir=out, bundle=bundle, batch_size=2,
                      max_steps=3, resolution=64, log_every=1,
                      image_every=2, ckpt_every=2, sample_steps=2)
        assert int(state.step) == 3
        # metrics stream written
        recs = [json.loads(l) for l in
                open(os.path.join(out, "metrics.jsonl"))]
        assert len(recs) >= 3 and "loss" in recs[0]
        # in-training SAMPLING grids dumped (cldm/logger.py:27-76 parity):
        # input/hint/reconstruction/samples + EMA samples
        files = os.listdir(os.path.join(out, "images"))
        for name in ("input", "hint", "reconstruction", "samples",
                     "samples_ema"):
            assert any(f.startswith(name + "_") for f in files), \
                (name, files)
        # EMA shadow exists, diverged from the live params (LitEma ramp),
        # and is checkpointed
        assert state.ema_params is not None
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(state.ema_params),
                                 jax.tree.leaves(state.cn_params))]
        assert max(diffs) > 0
        # resume picks up the saved step
        state2 = train(data_path=str(data_dir),
                       txt_path=str(data_dir / "data.txt"),
                       out_dir=out, bundle=bundle, batch_size=2,
                       max_steps=5, resolution=64, log_every=1,
                       image_every=100, ckpt_every=100)
        assert int(state2.step) == 5


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        from editanything_tpu.train.checkpointing import CheckpointManager
        state = {"w": jnp.arange(8.0), "step": jnp.asarray(7)}
        mgr = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=5)
        assert not mgr.maybe_save(3, state)      # off-interval
        assert mgr.maybe_save(5, state)
        like = {"w": jnp.zeros(8), "step": jnp.asarray(0)}
        restored = mgr.restore(like)
        np.testing.assert_array_equal(np.asarray(restored["w"]),
                                      np.arange(8.0))
        assert int(restored["step"]) == 7
        mgr.close()
