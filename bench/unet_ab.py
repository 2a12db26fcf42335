"""On-chip A/B of the conv lowerings at the latency operating point.

Measures the SD1.5 UNet forward (CFG batch 2, 64^2 latents) + ControlNet
forward under the current EA_RESNET_FUSED / EA_CONV9 environment. Run each
config in its OWN process (the gates are read at import):

    timeout 900 python bench/unet_ab.py                       # baseline
    EA_CONV9=1 timeout 900 python bench/unet_ab.py
    EA_RESNET_FUSED=1 timeout 900 python bench/unet_ab.py
    EA_RESNET_FUSED=1 EA_CONV9=1 timeout 900 python bench/unet_ab.py

Floor-differential timing (scan of HI reps minus scan of LO reps) like
bench/profile_components.py, immune to dispatch overhead.
"""
import os, sys, time
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# pin both gates to OFF unless the caller sets them: "baseline" must mean
# native conv even now that EA_CONV9 auto-defaults on on TPU
os.environ.setdefault("EA_CONV9", "0")
os.environ.setdefault("EA_RESNET_FUSED", "0")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EA_COMPILE_CACHE", "/tmp/ea_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from editanything_tpu.models import config as C
from editanything_tpu.models import unet as U
from editanything_tpu.models import controlnet as CN

DTYPE = jnp.bfloat16
KEY = jax.random.PRNGKey(0)
LO, HI = 5, 25


def rep_scan(fn, rep):
    # fold the carry into every floating top-level arg so XLA cannot hoist
    # the model call out of the scan (same scheme as profile_components.py)
    def run(*args):
        def body(c, _):
            out = fn(*[a + c if isinstance(a, jnp.ndarray) and
                       jnp.issubdtype(a.dtype, jnp.floating) else a
                       for a in args])
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out))
            return c + jnp.asarray(1e-6, DTYPE), tot
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


def bench(name, fn, *args):
    t0 = time.time()
    hi = rep_scan(fn, HI)
    t = (t_med(hi, *args) - t_med(rep_scan(fn, LO), *args)) / (HI - LO)
    print(f"{name}: {t*1000:.3f} ms  (setup {time.time()-t0:.0f}s)", flush=True)
    return t


cfgstr = (f"EA_RESNET_FUSED={os.environ.get('EA_RESNET_FUSED', '0')} "
          f"EA_CONV9={os.environ.get('EA_CONV9', '0')}")
print(f"config: {cfgstr}", flush=True)

ucfg = C.sd15_unet()
cn_cfg = C.ControlNetConfig(unet=ucfg)
ks = jax.random.split(KEY, 4)
up = jax.jit(lambda k: U.init_unet(k, ucfg, DTYPE))(ks[0])
cnp = jax.jit(lambda k: CN.init_controlnet(k, cn_cfg, DTYPE))(ks[1])
lat = jax.random.normal(KEY, (2, 64, 64, 4), DTYPE)
ctx = jax.random.normal(KEY, (2, 77, 768), DTYPE)
t2 = jnp.full((2,), 500, jnp.int32)
hint = jax.random.normal(KEY, (2, 512, 512, 3), DTYPE)
hint_emb = jax.jit(lambda p, h: CN._hint_embedding(p, h))(cnp, hint)

tu = bench("unet_fwd b2", lambda p, l: U.apply(p, ucfg, l, t2, ctx), up, lat)
tc = bench("controlnet b2",
           lambda p, l, he: CN.apply(p, cn_cfg, l, t2, ctx, None,
                                     hint_embedding=he), cnp, lat, hint_emb)
print(f"RESULT {cfgstr} unet={tu*1000:.3f}ms cn={tc*1000:.3f}ms "
      f"step~{(tu+tc)*1000:.2f}ms", flush=True)
