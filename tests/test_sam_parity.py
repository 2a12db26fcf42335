"""SAM forward parity vs a torch replica of the official architecture.

Catches the class of bug random-weight shape tests cannot (residual/branch
structure, MLP depths, PE details): the torch replica (tests/sam_replica.py)
is run side-by-side with models/sam.py on weights converted through the
REAL checkpoint converter (checkpoints.sam_to_tree), so the converter's
layout mapping is under test too.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from editanything_tpu.checkpoints.convert import sam_to_tree
from editanything_tpu.models import sam as SAM

from sam_replica import Sam

TINY = SAM.SAMConfig(
    img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
    global_attn_indexes=(1,), window_size=4, out_chans=16,
    prompt_embed_dim=16, decoder_mlp_dim=32,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = Sam(img_size=TINY.img_size, patch_size=TINY.patch_size,
              embed_dim=TINY.embed_dim, depth=TINY.depth,
              num_heads=TINY.num_heads,
              global_attn_indexes=TINY.global_attn_indexes,
              window_size=TINY.window_size, out_chans=TINY.out_chans,
              decoder_heads=TINY.decoder_heads,
              decoder_mlp_dim=TINY.decoder_mlp_dim).eval()
    # perturb rel-pos tables (zero-init hides gather-order bugs)
    with torch.no_grad():
        for blk in ref.image_encoder.blocks:
            blk.attn.rel_pos_h.normal_(0, 0.5)
            blk.attn.rel_pos_w.normal_(0, 0.5)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree = sam_to_tree(sd)
    return ref, tree


def test_image_encoder_parity(pair):
    ref, tree = pair
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, TINY.img_size, TINY.img_size, 3)) \
        .astype(np.float32)
    want = ref.image_encoder(torch.from_numpy(x).permute(0, 3, 1, 2)) \
        .detach().numpy()                       # (B, C, e, e)
    got = np.asarray(SAM.image_encoder(tree["image_encoder"], TINY,
                                       jnp.asarray(x)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)


def test_prompt_encoder_parity(pair):
    ref, tree = pair
    coords = np.array([[[10.0, 20.0], [40.0, 5.0], [0.0, 0.0]],
                       [[63.0, 63.0], [32.0, 16.0], [1.0, 2.0]]],
                      np.float32)
    labels = np.array([[1, 0, -1], [1, 2, 3]], np.int64)
    want = ref.prompt_encoder.embed_points(
        torch.from_numpy(coords), torch.from_numpy(labels)).detach().numpy()
    got = np.asarray(SAM.encode_points(tree["prompt_encoder"], TINY,
                                       jnp.asarray(coords),
                                       jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    want_pe = ref.prompt_encoder.dense_pe().detach().numpy()  # (1, D, e, e)
    got_pe = np.asarray(SAM.dense_positional_encoding(
        tree["prompt_encoder"], TINY))                        # (1, e, e, D)
    np.testing.assert_allclose(got_pe, want_pe.transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-5)


def test_mask_decoder_parity(pair):
    ref, tree = pair
    rng = np.random.default_rng(1)
    e = TINY.embedding_size
    d = TINY.prompt_embed_dim
    emb = rng.normal(0, 1, (1, e, e, d)).astype(np.float32)
    b = 3
    coords = (rng.uniform(0, TINY.img_size, (b, 2, 2))
              .astype(np.float32))
    labels = np.array([[1, -1]] * b, np.int64)

    sparse = SAM.encode_points(tree["prompt_encoder"], TINY,
                               jnp.asarray(coords), jnp.asarray(labels))
    dense = SAM.no_mask_dense_embedding(tree["prompt_encoder"], TINY, b)
    image_pe = SAM.dense_positional_encoding(tree["prompt_encoder"], TINY)
    got_m, got_iou = SAM.mask_decoder(tree["mask_decoder"], TINY,
                                      jnp.asarray(emb), image_pe,
                                      sparse, dense)

    sparse_t = ref.prompt_encoder.embed_points(torch.from_numpy(coords),
                                               torch.from_numpy(labels))
    dense_t = ref.prompt_encoder.no_mask_embed.weight \
        .reshape(1, -1, 1, 1).expand(b, -1, e, e)
    want_m, want_iou = ref.mask_decoder.predict_masks(
        torch.from_numpy(emb.transpose(0, 3, 1, 2)),
        ref.prompt_encoder.dense_pe(), sparse_t, dense_t)
    np.testing.assert_allclose(np.asarray(got_m),
                               want_m.detach().numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_iou),
                               want_iou.detach().numpy(),
                               atol=2e-4, rtol=1e-3)


def test_mask_decoder_shared_entry_parity(pair):
    """The AMG's batch-1-dense fast path must match the replica too."""
    ref, tree = pair
    rng = np.random.default_rng(2)
    e = TINY.embedding_size
    d = TINY.prompt_embed_dim
    emb = rng.normal(0, 1, (1, e, e, d)).astype(np.float32)
    b = 4
    coords = rng.uniform(0, TINY.img_size, (b, 1, 2)).astype(np.float32)
    labels = np.ones((b, 1), np.int64)

    sparse = SAM.encode_points(tree["prompt_encoder"], TINY,
                               jnp.asarray(coords), jnp.asarray(labels))
    dense1 = SAM.no_mask_dense_embedding(tree["prompt_encoder"], TINY, 1)
    image_pe = SAM.dense_positional_encoding(tree["prompt_encoder"], TINY)
    got_m, got_iou = SAM.mask_decoder(tree["mask_decoder"], TINY,
                                      jnp.asarray(emb), image_pe,
                                      sparse, dense1)

    sparse_t = ref.prompt_encoder.embed_points(torch.from_numpy(coords),
                                               torch.from_numpy(labels))
    dense_t = ref.prompt_encoder.no_mask_embed.weight \
        .reshape(1, -1, 1, 1).expand(b, -1, e, e)
    want_m, want_iou = ref.mask_decoder.predict_masks(
        torch.from_numpy(emb.transpose(0, 3, 1, 2)),
        ref.prompt_encoder.dense_pe(), sparse_t, dense_t)
    np.testing.assert_allclose(np.asarray(got_m),
                               want_m.detach().numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_iou),
                               want_iou.detach().numpy(),
                               atol=2e-4, rtol=1e-3)
