"""Native RLE codec + SAM dataset pipeline tests."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from editanything_tpu.ops import rle as R


def _random_mask(rng, h, w):
    m = (rng.rand(h, w) > 0.7).astype(np.uint8)
    return m


class TestRLE:
    def test_native_lib_builds(self):
        assert R._get_lib() is not None, "native rle.cc failed to compile"

    def test_roundtrip_native(self):
        rng = np.random.RandomState(0)
        for h, w in [(7, 5), (64, 64), (33, 101)]:
            m = _random_mask(rng, h, w)
            enc = R.encode(m)
            dec = R.decode(enc)
            np.testing.assert_array_equal(dec, m)

    def test_native_matches_numpy(self):
        rng = np.random.RandomState(1)
        for _ in range(5):
            m = _random_mask(rng, 31, 17)
            enc_np = R.encode_numpy(m)
            enc_c = R.encode(m)
            assert enc_np["counts"] == enc_c["counts"]
            np.testing.assert_array_equal(R.decode(enc_np),
                                          R.decode_numpy(enc_c))

    def test_all_ones_all_zeros(self):
        for fill in (0, 1):
            m = np.full((16, 16), fill, np.uint8)
            np.testing.assert_array_equal(R.decode(R.encode(m)), m)

    def test_id_map_paint_order(self):
        h = w = 16
        m1 = np.zeros((h, w), np.uint8)
        m1[2:10, 2:10] = 1
        m2 = np.zeros((h, w), np.uint8)
        m2[6:14, 6:14] = 1                  # overlaps m1
        idm = R.id_map([R.encode(m1), R.encode(m2)], h, w)
        assert idm[3, 3] == 1
        assert idm[7, 7] == 2               # later mask wins
        assert idm[0, 0] == 0
        # matches numpy painting
        ref = np.zeros((h, w), np.uint16)
        ref[m1 > 0] = 1
        ref[m2 > 0] = 2
        np.testing.assert_array_equal(idm, ref)


class TestSAMDataset:
    @pytest.fixture()
    def data_dir(self, tmp_path):
        rng = np.random.RandomState(0)
        lines = []
        for i in range(3):
            img = rng.randint(0, 255, (80, 96, 3), np.uint8)
            Image.fromarray(img).save(tmp_path / f"im{i}.jpg")
            masks = []
            for j in range(4):
                m = np.zeros((80, 96), np.uint8)
                y, x = rng.randint(0, 60), rng.randint(0, 70)
                m[y:y + 20, x:x + 20] = 1
                masks.append({"segmentation": R.encode(m)})
            anno = {"image": {"height": 80, "width": 96},
                    "annotations": masks}
            with open(tmp_path / f"im{i}.json", "w") as f:
                json.dump(anno, f)
            lines.append(repr({"target": f"im{i}.jpg",
                               "source": f"im{i}.json",
                               "prompt": f"caption {i}"}))
        (tmp_path / "data.txt").write_text("\n".join(lines) + "\n")
        return tmp_path

    def test_getitem(self, data_dir):
        from editanything_tpu.data import SAMDataset
        ds = SAMDataset(str(data_dir), str(data_dir / "data.txt"),
                        resolution=64)
        assert len(ds) == 3
        s = ds[0]
        assert s["jpg"].shape == (64, 64, 3)
        assert s["hint"].shape == (64, 64, 3)
        assert -1.0 <= s["jpg"].min() and s["jpg"].max() <= 1.0
        assert 0.0 <= s["hint"].min() and s["hint"].max() <= 1.0
        assert s["txt"] == "caption 0"
        # hint ids are quantized (uint8 values /255): only a few levels
        assert len(np.unique(s["hint"][..., 0])) <= 6

    def test_batcher(self, data_dir):
        from editanything_tpu.data import SAMDataset, make_batcher
        ds = SAMDataset(str(data_dir), str(data_dir / "data.txt"),
                        resolution=32)
        batches = list(make_batcher(ds, batch_size=1, num_workers=2,
                                    shuffle=True))
        assert len(batches) == 3
        assert batches[0]["jpg"].shape == (1, 32, 32, 3)
        assert isinstance(batches[0]["txt"][0], str)
