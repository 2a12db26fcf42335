from editanything_tpu.checkpoints.convert import (
    load_torch_state_dict,
    diffusers_to_tree,
    sam_to_tree,
    clip_text_to_tree,
    tree_to_diffusers,
)
from editanything_tpu.checkpoints.ldm import (
    add_control,
    cldm_controlnet_to_diffusers_sd,
    ldm_to_tree,
    load_ldm_bundle,
    transfer_control,
)
from editanything_tpu.checkpoints.lora import merge_kohya_lora
from editanything_tpu.checkpoints.surgery import (
    graft_controlnet_from_unet,
    transfer_control_offset,
)
