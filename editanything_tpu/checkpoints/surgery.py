"""Checkpoint surgery as pure tree ops.

Re-implements the reference's weight-surgery tools (SURVEY.md section 2.6):
- `graft_controlnet_from_unet`: copy the UNet encoder into a fresh
  ControlNet with zero-init'd new layers — the behavior of
  /root/reference/tools/tool_add_control_sd21.py:27-50 (control_* <-
  model.diffusion_*, new layers zero so training starts as a no-op).
- `transfer_control_offset`: move a trained ControlNet to another base by
  applying the weight offset new_base - old_base to the shared encoder
  copy — /root/reference/tool_transfer_control.py:35-58 semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_SHARED_KEYS = ("conv_in", "time_embedding", "down_blocks", "mid_block")


def graft_controlnet_from_unet(unet_params: dict, cn_init: dict) -> dict:
    """Copy encoder weights from a base UNet into a ControlNet tree.

    `cn_init` provides the structure + zero-init hint/zero convs (from
    models.controlnet.init_controlnet); the UNet's encoder replaces the
    shared submodules. Returns a new tree.
    """
    out = dict(cn_init)
    for k in _SHARED_KEYS:
        out[k] = jax.tree.map(lambda x: x, unet_params[k])
    return out


def _tree_sub(a, b):
    return jax.tree.map(lambda x, y: x - y.astype(x.dtype), a, b)


def _tree_add(a, b):
    return jax.tree.map(lambda x, y: x + y.astype(x.dtype), a, b)


def transfer_control_offset(cn_params: dict, old_unet: dict,
                            new_unet: dict) -> dict:
    """ControlNet trained on old base -> adapted to new base:
    shared = cn + (new - old); control-specific layers unchanged."""
    out = dict(cn_params)
    for k in _SHARED_KEYS:
        offset = _tree_sub(new_unet[k], old_unet[k])
        out[k] = _tree_add(cn_params[k], offset)
    return out
