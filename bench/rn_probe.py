"""Staged first-compile probe for the fused resnet Pallas kernel.

Run each shape in its OWN process with its own timeout (small first) so a
pathological Mosaic compile is attributable and never queues the larger
programs behind it (see the axon tunnel-wedge note in bench/_chip_session.sh):

    timeout 900 python bench/rn_probe.py small
    timeout 900 python bench/rn_probe.py mid
    timeout 900 python bench/rn_probe.py up3      # 640->320 @ 64^2, CFG b2
    timeout 900 python bench/rn_probe.py up3w     # 960->320 @ 64^2 (widest)

Prints compile time, maxdiff vs the composed-XLA reference, and a
floor-differential ms/call A/B (fused kernel vs composed ops).
"""
import os, sys, time
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EA_COMPILE_CACHE", "/tmp/ea_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from editanything_tpu.core import kernels as K
from editanything_tpu.models import blocks as B

shape = sys.argv[1] if len(sys.argv) > 1 else "small"
b, hw, cin, cout = {
    "small": (1, 16, 64, 64),
    "mid": (2, 32, 320, 320),
    "up3": (2, 64, 640, 320),
    "up3w": (2, 64, 960, 320),
}[shape]

key = jax.random.PRNGKey(0)
params = B.init_resnet_block(key, cin, cout, 1280, jnp.bfloat16)
x = jax.random.normal(key, (b, hw, hw, cin), jnp.bfloat16)
trow = jax.random.normal(key, (b, cout), jnp.bfloat16)
need = K._resnet_vmem_need(hw, hw, cin, cout, 2)
print(f"{shape}: b={b} {hw}x{hw} {cin}->{cout}  vmem_need={need/2**20:.1f} MiB",
      flush=True)

t0 = time.time()
out = K._resnet_diff(params, x, trow, 32, 1e-5)
out.block_until_ready()
print(f"  fused compile+run {time.time()-t0:.1f}s", flush=True)
ref = K._resnet_reference(params, x, trow, 32, 1e-5)
d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
m = np.abs(np.asarray(ref, np.float32)).max()
print(f"  maxdiff vs composed: {d:.4f} (ref magnitude {m:.1f})", flush=True)


def t_med(jfn, *args, n=3):
    o = jfn(*args); _ = float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        o = jfn(*args)
        _ = float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def rep_scan(fn, rep):
    def run(p, xx, tt):
        def body(c, _):
            return c + jnp.asarray(1e-6, xx.dtype), jnp.sum(
                fn(p, xx + c, tt).astype(jnp.float32))
        _, outs = jax.lax.scan(body, jnp.asarray(0, xx.dtype), None, length=rep)
        return outs
    return jax.jit(run)


LO, HI = 5, 25
for name, fn in [("fused", lambda p, xx, tt: K._resnet_diff(p, xx, tt, 32, 1e-5)),
                 ("composed", lambda p, xx, tt: K._resnet_reference(p, xx, tt, 32, 1e-5))]:
    t = (t_med(rep_scan(fn, HI), params, x, trow)
         - t_med(rep_scan(fn, LO), params, x, trow)) / (HI - LO)
    print(f"  {name}: {t*1000:.3f} ms/call", flush=True)
