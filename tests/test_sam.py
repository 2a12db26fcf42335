"""SAM + automatic mask generator tests (tiny config, CPU).

Checks the properties the edit pipelines rely on (SURVEY.md sections 2.5,
3.2): encoder shapes, window partition round-trip, prompt-label gating,
decoder output heads, NMS exactness vs a numpy reference, and the
show_anns-compatible ID-map encoding (editany_lora.py:426-449).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.models import sam as SAM
from editanything_tpu.perception import amg as AMG
from editanything_tpu.perception.predictor import SamPredictor


TINY = SAM.SAMConfig(
    img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
    global_attn_indexes=(1,), window_size=4, out_chans=16,
    prompt_embed_dim=16, decoder_mlp_dim=32,
)


@pytest.fixture(scope="module")
def params():
    return SAM.init_sam(jax.random.PRNGKey(0), TINY)


def test_image_encoder_shapes(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    emb = SAM.image_encoder(params["image_encoder"], TINY, x)
    assert emb.shape == (1, 8, 8, 16)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 13, 8))
    win, hw_pad = SAM._window_partition(x, 4)
    back = SAM._window_unpartition(win, 4, hw_pad, (10, 13))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_point_labels_gate_embeddings(params):
    pe = params["prompt_encoder"]
    coords = jnp.array([[[10.0, 20.0], [10.0, 20.0], [10.0, 20.0]]])
    pos = SAM.encode_points(pe, TINY, coords, jnp.array([[1, 1, 1]]))
    neg = SAM.encode_points(pe, TINY, coords, jnp.array([[0, 0, 0]]))
    pad = SAM.encode_points(pe, TINY, coords, jnp.array([[-1, -1, -1]]))
    assert not np.allclose(np.asarray(pos), np.asarray(neg))
    # pad slots are exactly the not_a_point embedding (no positional term)
    np.testing.assert_allclose(
        np.asarray(pad[0, 0]),
        np.asarray(pe["not_a_point_embed"]["weight"][0]), atol=1e-6)


def test_mask_decoder_shapes(params):
    emb = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16))
    image_pe = SAM.dense_positional_encoding(params["prompt_encoder"], TINY)
    sparse = SAM.encode_points(params["prompt_encoder"], TINY,
                               jnp.zeros((5, 1, 2)), jnp.ones((5, 1), jnp.int32))
    dense = SAM.no_mask_dense_embedding(params["prompt_encoder"], TINY, 5)
    masks, iou = SAM.mask_decoder(params["mask_decoder"], TINY, emb,
                                  image_pe, sparse, dense)
    assert masks.shape == (5, 4, 32, 32)   # 4x upscale of 8x8
    assert iou.shape == (5, 4)


def test_nms_matches_numpy_reference():
    rng = np.random.default_rng(0)
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes[:, :2] = xy
    boxes[:, 2:] = xy + wh
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.2

    got = np.asarray(AMG.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    jnp.asarray(valid), 0.5))

    # numpy greedy reference
    def iou(a, b):
        x0 = max(a[0], b[0]); y0 = max(a[1], b[1])
        x1 = min(a[2], b[2]); y1 = min(a[3], b[3])
        inter = max(x1 - x0, 0) * max(y1 - y0, 0)
        ar = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
        return inter / max(ar, 1e-6)

    order = np.argsort(-np.where(valid, scores, -np.inf))
    alive = np.ones(n, bool)
    keep = np.zeros(n, bool)
    for i in order:
        if not valid[i] or not alive[i]:
            continue
        keep[i] = True
        for j in range(n):
            if j != i and alive[j] and iou(boxes[i], boxes[j]) > 0.5:
                alive[j] = False
    np.testing.assert_array_equal(got, keep)


def test_amg_end_to_end_tiny(params):
    amg_cfg = AMG.AMGConfig(points_per_side=4, points_per_batch=8,
                            pred_iou_thresh=-10.0,   # keep everything
                            stability_score_thresh=-1.0,
                            max_masks=16)
    encode_fn, generate_fn = AMG.build_amg(TINY, amg_cfg)
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    emb = encode_fn(params, img)
    pts = jnp.asarray(AMG._grid_points(amg_cfg, 64, 64))
    out = jax.jit(generate_fn)(params, emb, pts)
    assert out["logits"].shape == (16, 32, 32)
    assert out["valid"].dtype == bool
    # every valid slot has a positive area and sane box
    v = np.asarray(out["valid"])
    assert v.any()
    areas = np.asarray(out["areas"])[v]
    assert (areas > 0).all()


def test_upscale_masks_matches_jax_image_resize():
    """The separable-matmul upscale must reproduce jax.image.resize's
    bilinear weights exactly (up, down, and non-square)."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 4, (5, 16, 24)).astype(np.float32))
    for out_hw in ((32, 48), (64, 24), (8, 12), (17, 33)):
        got = AMG.upscale_masks(logits, out_hw)
        want = jax.image.resize(logits, (5,) + out_hw, method="bilinear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_encode_id_map_matches_show_anns_semantics():
    # two masks: slot 0 covers left half, slot 1 covers center square
    logits = jnp.full((3, 8, 8), -10.0)
    logits = logits.at[0, :, :4].set(10.0)
    logits = logits.at[1, 2:6, 2:6].set(10.0)
    valid = jnp.array([True, True, False])
    m = np.asarray(AMG.encode_id_map(logits, valid, out_hw=(8, 8)))
    assert m.shape == (8, 8, 3)
    assert m[0, 0, 0] == 1           # left half -> id 1
    assert m[3, 3, 0] == 2           # overlap -> later mask wins (id 2)
    assert m[0, 7, 0] == 0           # uncovered -> 0
    assert (m[..., 2] == 0).all()    # B channel unused
    # uint16 encoding: id 300 would be R=44, G=1 — emulate via slot count
    logits2 = jnp.full((300, 4, 4), -10.0).at[299].set(10.0)
    valid2 = jnp.zeros((300,), bool).at[299].set(True)
    m2 = np.asarray(AMG.encode_id_map(logits2, valid2, out_hw=(4, 4)))
    assert m2[0, 0, 0] == 300 % 256 and m2[0, 0, 1] == 300 // 256


def test_predictor_click_flow(params):
    pred = SamPredictor(params, TINY)
    img = (np.random.default_rng(0).uniform(0, 255, (48, 56, 3))
           .astype(np.uint8))
    pred.set_image(img)
    masks, iou, low = pred.predict(point_coords=[[28, 24]],
                                   point_labels=[1],
                                   multimask_output=False)
    assert masks.shape == (1, 48, 56)
    assert masks.dtype == bool
    assert iou.shape == (1,)
    # box prompt
    masks2, _, _ = pred.predict(box=[10, 10, 40, 40], multimask_output=True)
    assert masks2.shape == (3, 48, 56)


def test_rel_pos_flash_matches_materializing_path():
    """The rel-pos flash kernel (global layers) must match the
    logits-materializing reference path."""
    import numpy as np
    cfg = SAM.SAMConfig(img_size=256, patch_size=8, embed_dim=32, depth=1,
                        num_heads=2, global_attn_indexes=(0,),
                        window_size=4, out_chans=16, prompt_embed_dim=16,
                        decoder_mlp_dim=32)
    params = SAM.init_sam(jax.random.PRNGKey(0), cfg)
    p = params["image_encoder"]["blocks"]["0"]["attn"]
    rng = np.random.RandomState(0)
    for kk in ("rel_pos_h", "rel_pos_w"):
        p[kk] = jnp.asarray(rng.randn(*p[kk].shape).astype(np.float32) * 0.1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 32))
    assert SAM._use_rel_pos_flash(32, 32)     # 1024 tokens qualifies
    ref = SAM._attention_with_rel_pos(p, x, cfg.num_heads, 0)
    out = SAM._attention_with_rel_pos_flash(p, x, cfg.num_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_select_candidates_matches_numpy_oracle():
    """Full AMG post-decode chain (stability/area/box stats -> quality
    filters -> greedy NMS -> slot compaction) vs an independent numpy
    reimplementation on random logits."""
    rng = np.random.default_rng(7)
    c, h, w = 48, 16, 16
    # blobby random logits so boxes/areas/stability vary
    base = rng.normal(0, 1, (c, 1, 1))
    logits = (rng.normal(0, 1, (c, h, w)) * 2 + base).astype(np.float32)
    iou = rng.uniform(0.5, 1.0, c).astype(np.float32)
    cfg = AMG.AMGConfig(pred_iou_thresh=0.7, stability_score_thresh=0.5,
                        stability_score_offset=1.0, box_nms_thresh=0.6,
                        max_masks=8)

    got = jax.jit(lambda l, i: AMG.select_candidates(l, i, cfg))(
        jnp.asarray(logits), jnp.asarray(iou))

    # ---- numpy oracle ----
    hi = (logits > cfg.mask_threshold + cfg.stability_score_offset) \
        .sum(axis=(1, 2))
    lo = (logits > cfg.mask_threshold - cfg.stability_score_offset) \
        .sum(axis=(1, 2))
    stability = hi / np.maximum(lo, 1)
    mask = logits > cfg.mask_threshold
    area = mask.sum(axis=(1, 2))
    boxes = np.zeros((c, 4), np.float32)
    for i in range(c):
        ys, xs = np.nonzero(mask[i])
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        else:
            boxes[i] = [10 ** 6, 10 ** 6, 0, 0]   # matches _mask_stats empties
    valid = (iou > cfg.pred_iou_thresh) & \
            (stability > cfg.stability_score_thresh) & (area > 0)

    def iou_xy(a, b):
        x0, y0 = max(a[0], b[0]), max(a[1], b[1])
        x1, y1 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x1 - x0, 0) * max(y1 - y0, 0)
        u = max(a[2] - a[0], 0) * max(a[3] - a[1], 0) + \
            max(b[2] - b[0], 0) * max(b[3] - b[1], 0) - inter
        return inter / max(u, 1e-6)

    order = np.argsort(-np.where(valid, iou, -np.inf), kind="stable")
    alive = np.ones(c, bool)
    keep = np.zeros(c, bool)
    for i in order:
        if not valid[i] or not alive[i]:
            continue
        keep[i] = True
        for j in range(c):
            if j != i and alive[j] and iou_xy(boxes[i], boxes[j]) > \
                    cfg.box_nms_thresh:
                alive[j] = False
    kept_idx = [i for i in range(c) if keep[i]][:cfg.max_masks]

    v = np.asarray(got["valid"])
    assert v.sum() == len(kept_idx)
    for slot, i in enumerate(kept_idx):
        assert v[slot]
        np.testing.assert_array_equal(np.asarray(got["logits"][slot]),
                                      logits[i])
        assert np.asarray(got["scores"][slot]) == pytest.approx(iou[i])
        np.testing.assert_allclose(np.asarray(got["boxes"][slot]), boxes[i])
        assert int(np.asarray(got["areas"][slot])) == area[i]
    assert not v[len(kept_idx):].any()


def test_select_candidates_overflow_and_empty():
    cfg = AMG.AMGConfig(pred_iou_thresh=0.5, stability_score_thresh=-1.0,
                        box_nms_thresh=0.99, max_masks=2)
    # 5 disjoint valid masks -> only the first 2 slots (candidate order)
    logits = np.full((5, 8, 8), -10.0, np.float32)
    for i in range(5):
        logits[i, i:i + 1, :] = 10.0
    iou = np.full((5,), 0.9, np.float32)
    out = AMG.select_candidates(jnp.asarray(logits), jnp.asarray(iou), cfg)
    v = np.asarray(out["valid"])
    assert v.tolist() == [True, True]
    np.testing.assert_array_equal(np.asarray(out["logits"][0]), logits[0])
    np.testing.assert_array_equal(np.asarray(out["logits"][1]), logits[1])
    # all invalid -> no valid slots
    out2 = AMG.select_candidates(jnp.asarray(logits),
                                 jnp.asarray(iou * 0.0), cfg)
    assert not np.asarray(out2["valid"]).any()


def test_bitmatch_harness_smoke(tmp_path):
    """tools/sam_bitmatch.py end-to-end with random weights: records masks,
    and a self-diff against its own recording is a perfect bit-match."""
    import sys
    sys.path.insert(0, "tools")
    try:
        import sam_bitmatch as BM
    finally:
        sys.path.pop(0)
    img = BM.synthetic_image(96, 80, seed=1)
    assert img.shape == (96, 80, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, BM.synthetic_image(96, 80, seed=1))

    params = SAM.init_sam(jax.random.PRNGKey(0), TINY)
    amg_cfg = AMG.AMGConfig(points_per_side=4, points_per_batch=8,
                            pred_iou_thresh=-10.0,
                            stability_score_thresh=-1.0, max_masks=8)
    ours = BM.run_amg(params, TINY, amg_cfg, img)
    assert ours["masks"].ndim == 3 and ours["masks"].dtype == bool
    assert ours["masks"].shape[1:] == (96, 80)
    report = BM.diff_masks(ours, ours)
    assert report["matched"] == report["ours"] == report["golden"]
    assert report["bit_exact"] == report["matched"]
    assert report["mean_iou"] == pytest.approx(1.0)


def test_mask_decoder_shared_entry_matches_batched(params):
    """dense_prompts of batch 1 routes the whole two-way transformer through
    the Pallas sam_twoway kernel (interpret mode here); outputs must match
    the per-prompt batched XLA path exactly — with and without pre-packed
    kernel weights (kernels.pack_twoway, the AMG's scan-hoisted form)."""
    from editanything_tpu.core.kernels import pack_twoway
    b = 5
    key = jax.random.PRNGKey(7)
    emb = jax.random.normal(key, (1, 8, 8, 16))
    image_pe = SAM.dense_positional_encoding(params["prompt_encoder"], TINY)
    coords = jax.random.uniform(jax.random.PRNGKey(8), (b, 1, 2)) * 64
    labels = jnp.ones((b, 1), jnp.int32)
    sparse = SAM.encode_points(params["prompt_encoder"], TINY, coords, labels)
    dense1 = SAM.no_mask_dense_embedding(params["prompt_encoder"], TINY, 1)
    denseb = SAM.no_mask_dense_embedding(params["prompt_encoder"], TINY, b)

    m_shared, iou_shared = SAM.mask_decoder(
        params["mask_decoder"], TINY, emb, image_pe, sparse, dense1)
    packed = pack_twoway(params["mask_decoder"]["transformer"])
    m_packed, iou_packed = SAM.mask_decoder(
        params["mask_decoder"], TINY, emb, image_pe, sparse, dense1,
        twoway_packed=packed)
    m_full, iou_full = SAM.mask_decoder(
        params["mask_decoder"], TINY, emb, image_pe, sparse, denseb)
    np.testing.assert_allclose(np.asarray(m_shared), np.asarray(m_full),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iou_shared), np.asarray(iou_full),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(m_packed), np.asarray(m_shared))
    np.testing.assert_array_equal(np.asarray(iou_packed),
                                  np.asarray(iou_shared))
