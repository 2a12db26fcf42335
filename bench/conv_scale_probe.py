"""Native-conv vs 9-shift-matmul A/B across spatial scales (on chip).

Decides the EA_CONV9 default gate: the 9-shift lowering wins at the UNet's
small-spatial/channel-heavy shapes (PROFILE.md conv-lowering decision) but
its fp32 accumulator costs 9 read+write passes of a (B*H*W, Cout) buffer,
so at VAE-decoder scales (512^2 spatial) the native conv could win back.
Covers both models' conv inventory:

    UNet/CN @64^2-8^2 latents, VAE decoder @64^2->512^2 pixels.
"""
import os, sys, time
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# the "native" rows go through L.conv2d — force the native lowering so the
# A/B is not 9shift-vs-9shift once EA_CONV9 defaults on (gate bypass)
os.environ["EA_CONV9"] = "0"
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EA_COMPILE_CACHE", "/tmp/ea_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from editanything_tpu.core import layers as L

DTYPE = jnp.bfloat16
KEY = jax.random.PRNGKey(0)


def rep_scan(fn, rep):
    def run(*args):
        def body(c, _):
            out = fn(*[a + c if isinstance(a, jnp.ndarray) and
                       jnp.issubdtype(a.dtype, jnp.floating) else a
                       for a in args])
            return c + jnp.asarray(1e-6, DTYPE), jnp.sum(
                out.astype(jnp.float32))
        _, outs = jax.lax.scan(body, jnp.asarray(0, DTYPE), None, length=rep)
        return outs
    return jax.jit(run)


def t_med(jfn, *args, n=3):
    # host fetch, not block_until_ready: the axon tunnel's block_until_ready
    # does not hard-sync (PROFILE.md methodology note)
    fetch = lambda o: float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    fetch(jfn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def bench(name, fn, *args, lo=5, hi=25):
    t = (t_med(rep_scan(fn, hi), *args)
         - t_med(rep_scan(fn, lo), *args)) / (hi - lo)
    print(f"{name}: {t*1000:.3f} ms", flush=True)
    return t


# (b, h, ch_in, ch_out): UNet/CN latent shapes across the batch curve
# (b = 2*num_samples with CFG), then VAE decoder pixel shapes. These are
# the measurements behind the layers._conv9_wins shape gate.
SHAPES = [
    (2, 64, 320, 320), (4, 64, 320, 320), (8, 64, 320, 320),
    (16, 64, 320, 320), (8, 64, 640, 320), (8, 64, 960, 320),
    (2, 32, 640, 640), (4, 32, 640, 640), (8, 32, 640, 640),
    (2, 16, 1280, 1280), (8, 16, 1280, 1280),
    (1, 64, 512, 512), (1, 128, 512, 512), (1, 256, 256, 256),
    (1, 512, 128, 128), (1, 512, 256, 128),
]
for b, hw, cin, cout in SHAPES:
    x = jax.random.normal(KEY, (b, hw, hw, cin), DTYPE)
    p = jax.jit(lambda k: L.init_conv2d(k, cin, cout, 3, DTYPE))(KEY)
    tn = bench(f"native {b}x{hw}^2 {cin}->{cout}",
               lambda pp, a: L.conv2d(pp, a, padding=1), p, x)
    t9 = bench(f"9shift {b}x{hw}^2 {cin}->{cout}",
               lambda pp, a: L._conv2d_9shift(pp["kernel"], a)
               + pp["bias"].astype(DTYPE), p, x)
    print(f"  -> ratio 9shift/native = {t9/tn:.2f}", flush=True)
