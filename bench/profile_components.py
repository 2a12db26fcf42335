"""Per-component on-chip profiling with floor-differential timing.

The axon tunnel adds a ~25-41 ms host-sync floor per call and
`block_until_ready` does not hard-sync, so every number here is measured as
    t = (T(rep_hi) - T(rep_lo)) / (rep_hi - rep_lo)
with the reps executed inside one jit'd `lax.scan` over perturbed inputs
(cancels the floor exactly; see PROFILE.md "methodology").

Run: python bench/profile_components.py [--section all|calib|unet|sam|amg]
Prints one line per measurement.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EA_COMPILE_CACHE",
                                 "/tmp/ea_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DTYPE = jnp.bfloat16
LO, HI = 5, 25
KEY = jax.random.PRNGKey(0)


def rep_scan(fn, rep):
    def run(*args):
        def body(c, _):
            out = fn(*[a + c if isinstance(a, jnp.ndarray) and
                       jnp.issubdtype(a.dtype, jnp.floating) else a
                       for a in args])
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out))
            return c + jnp.asarray(1e-6, DTYPE), tot
        _, outs = jax.lax.scan(body, jnp.asarray(0, DTYPE), None,
                               length=rep)
        return outs
    return jax.jit(run)


def t_med(jfn, *args, n=3):
    out = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        o = jfn(*args)
        _ = float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def bench(name, fn, *args, flops=None):
    t = (t_med(rep_scan(fn, HI), *args) - t_med(rep_scan(fn, LO), *args)) \
        / (HI - LO)
    extra = f"  {flops / t / 1e12:.1f} TFLOP/s" if flops else ""
    print(f"{name}: {t * 1000:.3f} ms{extra}", flush=True)
    return t


def section_calib():
    for m, rep in ((4096, HI), (8192, 10)):
        a = jax.random.normal(KEY, (m, m), DTYPE)
        b = jax.random.normal(jax.random.PRNGKey(1), (m, m), DTYPE)
        t = (t_med(rep_scan(lambda a, b: a @ b, rep), a, b)
             - t_med(rep_scan(lambda a, b: a @ b, max(2, rep // 5)), a, b)) \
            / (rep - max(2, rep // 5))
        print(f"matmul {m}^3 bf16: {t*1000:.3f} ms  "
              f"{2 * m ** 3 / t / 1e12:.0f} TFLOP/s", flush=True)


def section_unet():
    from editanything_tpu.models import config as C
    from editanything_tpu.models import unet as U
    from editanything_tpu.models import controlnet as CN
    ucfg = C.sd15_unet()
    cn_cfg = C.ControlNetConfig(unet=ucfg)
    ks = jax.random.split(KEY, 4)
    up = jax.jit(lambda k: U.init_unet(k, ucfg, DTYPE))(ks[0])
    cnp = jax.jit(lambda k: CN.init_controlnet(k, cn_cfg, DTYPE))(ks[1])
    ctx = jax.random.normal(KEY, (2, 77, 768), DTYPE)
    t2 = jnp.full((2,), 500, jnp.int32)
    hint = jax.random.normal(KEY, (2, 512, 512, 3), DTYPE)
    hint_emb = jax.jit(lambda p, h: CN._hint_embedding(p, h))(cnp, hint)
    for b in (1, 2, 4, 8):
        lat = jax.random.normal(KEY, (b, 64, 64, 4), DTYPE)
        ctxb = jax.random.normal(KEY, (b, 77, 768), DTYPE)
        tb = jnp.full((b,), 500, jnp.int32)
        t = bench(f"unet_fwd b{b}",
                  lambda p, l, c=ctxb, tt=tb: U.apply(p, ucfg, l, tt, c),
                  up, lat)
        print(f"  per-image: {t / b * 1000:.2f} ms", flush=True)
    lat2 = jax.random.normal(KEY, (2, 64, 64, 4), DTYPE)
    bench("controlnet b2 (hint hoisted, all outputs)",
          lambda p, l, he: CN.apply(p, cn_cfg, l, t2, ctx, None,
                                    hint_embedding=he),
          cnp, lat2, hint_emb)


def section_sam():
    from editanything_tpu.models import sam as SAM
    cfg = SAM.sam_vit_h()
    enc = jax.jit(lambda k: SAM.init_image_encoder(k, cfg, DTYPE))(KEY)
    x = jax.random.normal(KEY, (1, 64, 64, cfg.embed_dim), DTYPE)
    tw = bench("vith windowed block",
               lambda p, x: SAM._encoder_block(p, x, cfg, 14),
               enc["blocks"]["0"], x)
    tg = bench("vith global block",
               lambda p, x: SAM._encoder_block(p, x, cfg, 0),
               enc["blocks"]["7"], x)
    print(f"  -> encoder estimate 28w+4g: {(28 * tw + 4 * tg) * 1000:.1f} ms",
          flush=True)


def section_up3():
    """Drill-down of the UNet's costliest decoder block (up3: 3 resnets +
    3 spatial transformers at 64x64/320ch, CFG batch 2). Sums the measured
    pieces against the block's whole-graph attribution (9.6 ms in r3) to
    expose composition overhead (layout changes, fusion breaks)."""
    from editanything_tpu.core import layers as L
    from editanything_tpu.models import blocks as B
    ks = jax.random.split(KEY, 8)
    b, hw, c = 2, 64, 320
    n = hw * hw
    x_cat0 = jax.random.normal(KEY, (b, hw, hw, 960), DTYPE)
    x_cat = jax.random.normal(KEY, (b, hw, hw, 640), DTYPE)
    x = jax.random.normal(KEY, (b, hw, hw, c), DTYPE)
    seq = jax.random.normal(KEY, (b, n, c), DTYPE)
    ctx = jax.random.normal(KEY, (b, 77, 768), DTYPE)
    temb = jax.random.normal(KEY, (b, 1280), DTYPE)

    r0 = jax.jit(lambda k: B.init_resnet_block(k, 960, c, 1280, DTYPE))(ks[0])
    r1 = jax.jit(lambda k: B.init_resnet_block(k, 640, c, 1280, DTYPE))(ks[1])
    st = jax.jit(lambda k: B.init_spatial_transformer(
        k, c, 768, dtype=DTYPE))(ks[2])
    at = jax.jit(lambda k: B.init_attention(k, c, None, DTYPE))(ks[3])
    ax = jax.jit(lambda k: B.init_attention(k, c, 768, DTYPE))(ks[4])
    tr = st["transformer_blocks"]["0"]

    ts = {}
    ts["resnet 960->320"] = bench(
        "resnet 960->320", lambda p, a, t: B.resnet_block(p, a, t), r0,
        x_cat0, temb)
    ts["resnet 640->320"] = bench(
        "resnet 640->320", lambda p, a, t: B.resnet_block(p, a, t), r1,
        x_cat, temb)
    ts["spatial_transformer"] = bench(
        "spatial_transformer 320/4096", lambda p, a, cc:
        B.spatial_transformer(p, a, cc, heads=8), st, x, ctx)
    bench("  self-attn layer (qkv+flash+out)", lambda p, s:
          B.attention_layer(p, s, heads=8), at, seq)
    bench("  cross-attn layer", lambda p, s, cc:
          B.attention_layer(p, s, cc, heads=8), ax, seq, ctx)
    bench("  ff (geglu+out)", lambda p, s: L.linear(
        p["ff"]["net"]["2"], L.geglu(p["ff"]["net"]["0"]["proj"], s)),
        tr, seq)
    bench("  layer_norm", lambda p, s: L.layer_norm(p["norm1"], s), tr, seq)
    bench("  gn(640, no silu)", lambda p, a: __import__(
        "editanything_tpu.core.kernels", fromlist=["x"]).group_norm_silu(
        p["norm1"], a, apply_silu=False), r1, x_cat)
    block = 3 * ts["resnet 640->320"] + 3 * ts["spatial_transformer"] \
        + (ts["resnet 960->320"] - ts["resnet 640->320"])
    print(f"  -> up3 sum-of-parts: {block*1000:.2f} ms "
          "(whole-graph attribution was 9.6)", flush=True)
    # A/B: same resnet with ALL Pallas disabled (XLA GroupNorm fallback)
    # isolates what the fused GN kernel buys inside a resnet
    import editanything_tpu.core.kernels as KK
    old = KK._DISABLED
    KK._DISABLED = True
    try:
        bench("resnet 640->320 [no pallas]",
              lambda p, a, t: B.resnet_block(p, a, t), r1, x_cat, temb)
    finally:
        KK._DISABLED = old


def section_conv():
    """Raw conv vs equivalent-matmul roofline at the up3 resnet shapes."""
    from editanything_tpu.core import layers as L
    b, hw = 2, 64
    m = b * hw * hw
    for cin, cout in ((640, 320), (320, 320), (960, 320)):
        x = jax.random.normal(KEY, (b, hw, hw, cin), DTYPE)
        p = jax.jit(lambda k: L.init_conv2d(k, cin, cout, 3, DTYPE))(KEY)
        fl = 2 * m * 9 * cin * cout
        bench(f"conv3x3 {cin}->{cout} @64^2 b2",
              lambda pp, a: L.conv2d(pp, a, padding=1), p, x, flops=fl)
        a2 = jax.random.normal(KEY, (m, 9 * cin), DTYPE)
        w2 = jax.random.normal(KEY, (9 * cin, cout), DTYPE)
        bench(f"  eq. matmul {m}x{9 * cin}x{cout}",
              lambda a, w: a @ w, a2, w2, flops=fl)
        # 9-shift decomposition: padded input, 9 slice+matmul accumulations
        w9 = jax.random.normal(KEY, (9, cin, cout), DTYPE)

        def conv9(a, w):
            ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    s = jax.lax.dynamic_slice(
                        ap, (0, dy, dx, 0), (b, hw, hw, cin))
                    y = jnp.einsum("bhwc,co->bhwo", s, w[dy * 3 + dx])
                    out = y if out is None else out + y
            return out
        bench(f"  9-shift matmul {cin}->{cout}", conv9, x, w9, flops=fl)


def section_amg():
    from editanything_tpu.models import sam as SAM
    from editanything_tpu.perception import AMGConfig, build_amg
    from editanything_tpu.perception.amg import _grid_points
    cfg = SAM.sam_vit_h()
    acfg = AMGConfig()
    params = jax.jit(lambda k: SAM.init_sam(k, cfg, DTYPE))(KEY)
    enc, gen = build_amg(cfg, acfg)
    enc, gen = jax.jit(enc), jax.jit(gen)
    img = jax.random.normal(KEY, (1, 1024, 1024, 3), DTYPE)
    grid = jnp.asarray(_grid_points(acfg, 1024, 1024))
    emb = enc(params, img)
    for name, fn, args in (("sam_encode_1024", enc, (params, img)),
                           ("amg_generate", gen, (params, emb, grid))):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts = []
        for _i in range(5):
            t0 = time.perf_counter()
            o = fn(*args)
            _ = float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {sorted(ts)[2]*1000:.1f} ms (incl ~25 ms sync floor)",
              flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--section", default="all",
                   choices=["all", "calib", "unet", "up3", "conv", "sam", "amg"])
    a = p.parse_args()
    for name in (["calib", "unet", "up3", "conv", "sam", "amg"]
                 if a.section == "all" else [a.section]):
        print(f"--- {name}", flush=True)
        globals()[f"section_{name}"]()
