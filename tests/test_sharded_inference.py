"""Data-parallel inference over the virtual 8-CPU mesh: sharded == local."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editanything_tpu.parallel import make_mesh
from editanything_tpu.pipelines import GenerationPipeline, random_bundle
from editanything_tpu.pipelines.bundle import place_on_mesh


def _cond(h=96, w=96):
    rng = np.random.RandomState(0)
    c = np.zeros((h, w, 3), np.uint8)
    c[..., 0] = rng.randint(0, 5, (h, w)).astype(np.uint8)
    return c


class TestShardedInference:
    def test_mesh_matches_single_device(self):
        bundle = random_bundle(jax.random.PRNGKey(0), tiny=True,
                               controlnet_names=("sam",))
        local = GenerationPipeline(bundle, controlnet="sam")
        ref = local(prompt="a cat", condition_image=_cond(),
                    num_samples=8, image_resolution=64, num_steps=2, seed=3)

        mesh = make_mesh(n_data=8, n_model=1)
        sharded_bundle = place_on_mesh(bundle, mesh)
        pipe = GenerationPipeline(sharded_bundle, controlnet="sam",
                                  mesh=mesh)
        out = pipe(prompt="a cat", condition_image=_cond(),
                   num_samples=8, image_resolution=64, num_steps=2, seed=3)
        assert out.shape == (8, 64, 64, 3)
        # same math, same seed; sharded fusion layouts may flip a handful
        # of pixels across the uint8 rounding boundary
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3

    def test_dp_denoise_compiles_zero_collectives(self):
        """The evidence behind PROFILE.md's v5e-8 projection: the DP edit
        program has NO cross-sample terms, and parallel.mesh_jit
        (shard_map over `data`) compiles it with ZERO collectives — each
        chip runs exactly the single-chip program at batch/N, so N-chip
        throughput is N x the per-chip batch curve point. (Plain
        jit+GSPMD fails this: the Pallas group-norm/attention calls have
        no partitioning rule, so GSPMD all-gathers their sharded operands
        and computes the full batch redundantly on every device.)"""
        from editanything_tpu.engine import DenoiseConfig
        from editanything_tpu.parallel.sharding import replicate, shard_batch
        from editanything_tpu.pipelines.generate import ProgramCache

        bundle = random_bundle(jax.random.PRNGKey(3), tiny=True,
                               controlnet_names=("sam",))
        mesh = make_mesh(n_data=8, n_model=1)
        dcfg = DenoiseConfig(unet=bundle.unet_cfg,
                             controlnets=bundle.controlnet_cfgs(("sam",)),
                             num_steps=2, sampler="unipc")
        program = ProgramCache().get(bundle, dcfg, 2, with_scale_maps=False,
                                     decode=False, mesh=mesh)
        params = replicate(mesh, {
            "unet": bundle.unet,
            "controlnets": bundle.controlnet_params(("sam",))})
        d = bundle.unet_cfg.cross_attention_dim
        ctx = shard_batch(mesh, {
            "cond": jnp.zeros((8, 77, d)), "uncond": jnp.zeros((8, 77, d))})
        lat = shard_batch(mesh, jnp.zeros((8, 8, 8, 4)))
        inputs = {"controlnet_conds": [shard_batch(
            mesh, jnp.zeros((8, 64, 64, 3)))],
            "controlnet_scales": [1.0], "guidance_scale": 7.5}
        out = program(params, lat, ctx, inputs)
        assert out.shape == (8, 8, 8, 4)
        (jitted,) = program.cache.values()
        hlo = jitted.lower(params, lat, ctx, inputs).compile().as_text()
        for op in ("all-reduce", "all-gather", "collective-permute",
                   "all-to-all", "reduce-scatter"):
            assert op not in hlo, f"unexpected collective {op} in DP program"

    def test_batch_shards_over_data_axis(self):
        bundle = random_bundle(jax.random.PRNGKey(1), tiny=True,
                               controlnet_names=("sam",))
        mesh = make_mesh(n_data=8, n_model=1)
        pipe = GenerationPipeline(place_on_mesh(bundle, mesh),
                                  controlnet="sam", mesh=mesh)
        lat = pipe._shard(jnp.zeros((8, 8, 8, 4)))
        shard_shapes = {s.data.shape for s in lat.addressable_shards}
        assert shard_shapes == {(1, 8, 8, 4)}


class TestShardedEdit:
    def test_edit_over_mesh(self):
        from editanything_tpu.pipelines import EditPipeline, random_bundle
        from editanything_tpu.pipelines.bundle import place_on_mesh
        bundle = random_bundle(jax.random.PRNGKey(2), tiny=True,
                               controlnet_names=("sam", "inpaint"))
        mesh = make_mesh(n_data=8, n_model=1)
        pipe = EditPipeline(place_on_mesh(bundle, mesh),
                            controls=("sam", "inpaint"), mesh=mesh)
        rng = np.random.RandomState(0)
        out = pipe(image=rng.randint(0, 255, (96, 96, 3)).astype(np.uint8),
                   mask=np.full((96, 96), 255, np.uint8), prompt="cat",
                   condition_image=_cond(), num_samples=8,
                   image_resolution=64, num_steps=2, alignment_ratio=0.5,
                   seed=0)
        assert out.shape == (8, 64, 64, 3)

    def test_mix_mode_two_samples_on_mesh(self):
        """Regression (round-5 advisor): the batch-shard guess must NOT
        shard the (2,) PRNG noise_key/eta_key over the data axis when
        num_samples == 2 — mesh_jit derives in_specs from placement, so a
        sharded key fails wrap_key_data at trace time."""
        from editanything_tpu.pipelines import EditPipeline, random_bundle
        from editanything_tpu.pipelines.bundle import place_on_mesh
        bundle = random_bundle(jax.random.PRNGKey(2), tiny=True,
                               controlnet_names=("sam", "inpaint"))
        mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
        pipe = EditPipeline(place_on_mesh(bundle, mesh),
                            controls=("sam", "inpaint"),
                            inpaint_mode="mix", mesh=mesh)
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        out = pipe(image=img, mask=np.full((64, 64), 255, np.uint8),
                   prompt="cat", condition_image=_cond(), num_samples=2,
                   image_resolution=64, num_steps=2, seed=0,
                   alpha_weight=0.3)
        assert out.shape == (2, 64, 64, 3)
        # eta>0 exercises the eta_key leg of the same guess
        out2 = pipe(image=img, mask=np.full((64, 64), 255, np.uint8),
                    prompt="cat", condition_image=_cond(), num_samples=2,
                    image_resolution=64, num_steps=2, seed=0,
                    sampler="ddim", eta=0.5)
        assert out2.shape == (2, 64, 64, 3)
