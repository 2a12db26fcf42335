"""GroundingDINO official-checkpoint parity: converter structure + forward
golden vs the torch replica (tests/dino_replica.py).

Closes the round-1 gap (PARITY.md): the model must import
groundingdino_swint_ogc.pth weight-for-weight. The replica reproduces the
official module tree, so these tests validate every converter key and the
full forward math (swin -> bert -> fusion encoder -> two-stage selection
-> decoder -> contrastive heads) at a tiny config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from editanything_tpu.checkpoints.detectors import dino_to_tree  # noqa: E402
from editanything_tpu.models import groundingdino as GD  # noqa: E402
from editanything_tpu.models import swin as SW  # noqa: E402

from dino_replica import (BiAttentionBlock, MSDeformAttn,  # noqa: E402
                          TinyDINOReplica)
from test_convert import tree_paths  # noqa: E402


def _tiny_cfg():
    return GD.tiny_dino_config()


@pytest.fixture(scope="module")
def replica():
    torch.manual_seed(0)
    cfg = _tiny_cfg()
    m = TinyDINOReplica(
        swin_dim=cfg.swin.embed_dim, swin_depths=(2, 1, 1, 1),
        swin_heads=cfg.swin.num_heads, swin_window=cfg.swin.window_size,
        d=cfg.hidden_dim, heads=cfg.nheads, ffn=cfg.dim_feedforward,
        levels=cfg.num_feature_levels, points=cfg.n_points,
        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
        num_queries=cfg.num_queries, gn_groups=cfg.input_proj_groups,
        pe_temperature=cfg.pe_temperature).eval()
    # random weights (not the tied default inits) to catch layout bugs
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    return m


@pytest.fixture(scope="module")
def jax_params(replica):
    sd = {k: v.detach().numpy() for k, v in replica.state_dict().items()}
    return dino_to_tree(sd)


class TestDinoConverter:
    def test_structure_matches_init(self, jax_params):
        ours = GD.init_dino(jax.random.PRNGKey(0), _tiny_cfg())
        assert tree_paths(jax_params) == tree_paths(ours)

    def test_shared_bbox_embed_deduped(self, replica):
        sd = {k: v.detach().numpy()
              for k, v in replica.state_dict().items()}
        # the official checkpoint carries 6 tied copies + the decoder alias;
        # fake the extra aliases a real checkpoint would contain
        extra = dict(sd)
        for k, v in sd.items():
            if k.startswith("bbox_embed.0."):
                extra["bbox_embed.1." + k[len("bbox_embed.0."):]] = v
                extra["transformer.decoder." + k] = v
        t1 = dino_to_tree(sd)
        t2 = dino_to_tree(extra)
        assert tree_paths(t1) == tree_paths(t2)


class TestDinoForwardParity:
    @pytest.fixture(scope="class")
    def io(self):
        rng = np.random.RandomState(3)
        px = rng.randn(1, 64, 64, 3).astype(np.float32)
        # caption "a dog." through the tiny vocab: [CLS] w w . [SEP] pads
        ids = np.zeros((16,), np.int64)
        ids[:5] = [2, 7, 9, 4, 3]       # CLS tok tok . SEP (tiny ids)
        mask = np.zeros((16,), bool)
        mask[:5] = True
        self_mask, pos_ids = GD.generate_text_masks(ids, (2, 3, 4))
        return px, ids, mask, self_mask, pos_ids

    def test_full_forward(self, replica, jax_params, io):
        px, ids, mask, self_mask, pos_ids = io
        cfg = _tiny_cfg()
        with torch.no_grad():
            ref = replica(torch.tensor(px).permute(0, 3, 1, 2),
                          torch.tensor(ids)[None],
                          torch.tensor(mask)[None],
                          torch.tensor(self_mask)[None],
                          torch.tensor(pos_ids.astype(np.int64))[None])
        out = GD.dino_forward(jax_params, cfg, jnp.asarray(px),
                              jnp.asarray(ids)[None],
                              jnp.asarray(mask)[None],
                              jnp.asarray(self_mask)[None],
                              jnp.asarray(pos_ids)[None])
        ref_logits = ref["logits"].numpy()
        ref_boxes = ref["boxes"].numpy()
        ours_logits = np.asarray(out["logits"])
        ours_boxes = np.asarray(out["boxes"])
        # -inf at padded text positions on both sides
        assert np.isneginf(ours_logits[:, ~mask]).all()
        assert np.isneginf(ref_logits[:, ~mask]).all()
        np.testing.assert_allclose(ours_logits[:, mask],
                                   ref_logits[:, mask],
                                   rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(ours_boxes, ref_boxes,
                                   rtol=1e-3, atol=2e-4)


class TestUnitParity:
    def test_bi_attention_block(self):
        torch.manual_seed(1)
        d, e, h = 16, 32, 2
        blk = BiAttentionBlock(d, e, h).eval()
        with torch.no_grad():
            for p in blk.parameters():
                p.copy_(torch.randn_like(p) * 0.1)
        sd = {k: v.detach().numpy() for k, v in blk.state_dict().items()}
        # convert by hand through the generic machinery
        from editanything_tpu.checkpoints.convert import state_dict_to_tree
        params = state_dict_to_tree(sd, norm_weight_name="scale")
        v = np.random.RandomState(0).randn(10, d).astype(np.float32)
        l = np.random.RandomState(1).randn(6, d).astype(np.float32)
        pad = np.zeros((6,), bool)
        pad[4:] = True
        with torch.no_grad():
            rv, rl = blk(torch.tensor(v)[None], torch.tensor(l)[None],
                         attention_mask_l=torch.tensor(pad))
        ov, ol = GD._bi_attention(params, jnp.asarray(v), jnp.asarray(l),
                                  h, jnp.asarray(pad))
        np.testing.assert_allclose(np.asarray(ov), rv[0].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ol), rl[0].numpy(),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("ref_dim", [2, 4])
    def test_deform_attn(self, ref_dim):
        torch.manual_seed(2)
        d, heads, points = 16, 2, 3
        shapes = [(6, 8), (3, 4)]
        attn = MSDeformAttn(d, len(shapes), heads, points).eval()
        with torch.no_grad():
            for p in attn.parameters():
                p.copy_(torch.randn_like(p) * 0.1)
        sd = {k: v.detach().numpy() for k, v in attn.state_dict().items()}
        from editanything_tpu.checkpoints.convert import state_dict_to_tree
        params = state_dict_to_tree(sd)
        rng = np.random.RandomState(5)
        q = rng.randn(7, d).astype(np.float32)
        val = rng.randn(6 * 8 + 3 * 4, d).astype(np.float32)
        # references beyond the border exercise zero-padding semantics
        refs = rng.uniform(-0.1, 1.1,
                           (7, len(shapes), ref_dim)).astype(np.float32)
        if ref_dim == 4:
            refs[..., 2:] = np.abs(refs[..., 2:]) + 0.05
        with torch.no_grad():
            ref_out = attn(torch.tensor(q)[None],
                           torch.tensor(refs)[None],
                           torch.tensor(val)[None], shapes)[0].numpy()
        ours = GD.deform_attn(params, jnp.asarray(q), jnp.asarray(refs),
                              jnp.asarray(val), shapes, heads=heads,
                              points=points)
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-4, atol=1e-5)
