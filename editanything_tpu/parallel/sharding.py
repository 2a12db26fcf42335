"""Mesh & sharding policy — the framework's distribution layer.

The reference's only distribution is 8-GPU Lightning DDP training
(/root/reference/sam_train_sd21.py:35) plus batch-level inference parallelism
(num_images_per_prompt + CFG doubling). TPU-native mapping (SURVEY.md
section 2.8): a `jax.sharding.Mesh` with axes

    data   — batch (samples x CFG pairs at inference; global batch at
             training). Collectives (psum of grads) ride ICI.
    model  — optional tensor parallelism: attention heads / FFN columns /
             conv output channels sharded; used when a model doesn't fit or
             to cut latency at small batch.

Inference default: pure data parallelism (diffusion batches are
embarrassingly parallel). Training default: data parallelism with optional
FSDP-style parameter sharding along `data` (each step all-gathers params,
reduce-scatters grads — XLA inserts these from the shardings).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    dev = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Shard the leading (batch) axis of every leaf over the data axis."""
    def to_sharded(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(to_sharded, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (weights at inference).

    One batched device_put for the whole tree: per-leaf puts pay dispatch
    overhead thousands of times (measured minutes for SD-sized trees on
    the virtual-device mesh)."""
    leaves, treedef = jax.tree.flatten(tree)
    sh = NamedSharding(mesh, P())
    placed = jax.device_put(leaves, [sh] * len(leaves))
    return jax.tree.unflatten(treedef, placed)


def batch_spec(x):
    return P("data", *([None] * (x.ndim - 1)))


def fsdp_spec(x) -> P:
    """Shard the largest axis of a parameter over `data` if cleanly
    divisible and worth it; else replicate (zero-conv biases etc.)."""
    if x.ndim == 0 or x.size < 1 << 16:
        return P()
    axis = int(np.argmax(x.shape))
    spec = [None] * x.ndim
    spec[axis] = "data"
    return P(*spec)


def tp_spec(path: str, x) -> Optional[P]:
    """Tensor-parallel layout for transformer weights along `model`:
    column-parallel QKV/fc1/GEGLU-proj, row-parallel out/fc2 — the Megatron
    split expressed purely as shardings (XLA inserts the psums)."""
    if x.ndim != 2:
        return None
    if any(k in path for k in ("to_q", "to_k", "to_v", "q_proj", "k_proj",
                               "v_proj", "fc1", "ff/net/0")):
        return P(None, "model")
    if any(k in path for k in ("to_out", "out_proj", "fc2", "ff/net/2")):
        return P("model", None)
    return None


def shard_params_tp(mesh: Mesh, params, *, also_fsdp: bool = False):
    """Apply tensor-parallel specs where they match; else FSDP or replicate."""
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    xs, shardings = [], []
    for path, x in flat:
        keystr = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = tp_spec(keystr, x)
        if spec is not None:
            axis = list(spec).index("model")
            if x.shape[axis] % n_model != 0:
                spec = None
        if spec is None and also_fsdp:
            spec = fsdp_spec(x)
            if any(s == "data" for s in spec) and \
                    x.shape[int(np.argmax(x.shape))] % n_data != 0:
                spec = P()
        if spec is None:
            spec = P()
        xs.append(x)
        shardings.append(NamedSharding(mesh, spec))
    # one batched device_put (see replicate)
    placed = jax.device_put(xs, shardings)
    return jax.tree_util.tree_unflatten(treedef, placed)


def mesh_jit(program, mesh: Mesh):
    """jit a DP inference program through shard_map over the `data` axis.

    Plain `jit` + GSPMD is NOT enough here: the Pallas kernels
    (group_norm_silu, flash attention) carry no partitioning rule, so
    GSPMD wraps every call in an all-gather of the sharded activations +
    redundant full-batch compute + re-slice (observed in the compiled
    HLO). shard_map hands each device its batch shard with per-shard
    SHAPES, so the kernels and everything else compile exactly as the
    single-chip program — zero collectives
    (test_sharded_inference.py::test_dp_denoise_compiles_zero_collectives).

    in_specs come from each argument's ACTUAL placement (NamedSharding
    committed by shard_batch/replicate) — no shape-based guessing, which
    would misclassify e.g. a (2,)-PRNG-key leaf at batch 2. Host numpy /
    scalar leaves replicate.
    """
    from jax.experimental.shard_map import shard_map

    def spec_of(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding):
            return sh.spec
        return P()

    cache = {}

    def runner(*args):
        specs = tuple(jax.tree.map(spec_of, a) for a in args)
        # PartitionSpec subclasses tuple (a pytree container), so key on
        # the repr of the spec trees + arg treedefs instead of leaves
        key = (tuple(jax.tree.structure(a) for a in args), str(specs))
        if key not in cache:
            cache[key] = jax.jit(shard_map(
                program, mesh=mesh, in_specs=specs,
                out_specs=P("data"), check_rep=False))
        return cache[key](*args)

    runner.cache = cache          # exposed for HLO inspection in tests
    return runner


def shard_params_fsdp(mesh: Mesh, params):
    """FSDP-style parameter layout: big tensors split along `data`.

    Divisibility guard: tensors whose max axis doesn't divide by the mesh
    size stay replicated (XLA would pad; cheap tensors aren't worth it)."""
    n_data = mesh.shape["data"]

    def place(x):
        spec = fsdp_spec(x)
        if any(s == "data" for s in spec) and \
                x.shape[int(np.argmax(x.shape))] % n_data != 0:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, params)
