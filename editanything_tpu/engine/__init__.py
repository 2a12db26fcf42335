from editanything_tpu.engine.denoise import (
    DenoiseConfig,
    build_denoiser,
)
