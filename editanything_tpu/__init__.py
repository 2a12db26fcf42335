"""EditAnything-TPU: a TPU-native (JAX/XLA/Pallas) image-editing engine.

A from-scratch rebuild of the capabilities of sail-sg/EditAnything (SAM +
ControlNet + Stable Diffusion + BLIP2 image editing) designed for TPU:

- functional models (pure ``apply(params, ...)`` pytrees) that jit/pjit cleanly
- one-compile denoising loops (``lax.scan``), CFG batched on-device
- Pallas flash-attention and fused GroupNorm+SiLU kernels on the hot path
- ``jax.sharding.Mesh`` + NamedSharding data/tensor parallelism over ICI

Layering (see SURVEY.md section 7):
    core/        NN primitives & Pallas kernels
    models/      UNet, ControlNet, VAE, CLIP, SAM, BLIP2
    samplers/    DDIM / UniPC scheduler math as pure functions
    engine/      compiled edit programs (denoise scans, sharding policy)
    perception/  SAM automatic mask generation, ID-map conditions
    pipelines/   user-facing flows (generate / inpaint / sketch / tile / ref)
    checkpoints/ torch & diffusers & LoRA & TI weight import
    train/       ControlNet training (data-parallel pjit)
    apps/        CLI & Gradio entry points matching the reference API
"""

__version__ = "0.1.0"
