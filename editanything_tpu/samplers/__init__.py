from editanything_tpu.samplers.schedule import (
    NoiseSchedule,
    make_schedule,
    make_timesteps,
    add_noise,
)
from editanything_tpu.samplers.ddim import ddim_step
from editanything_tpu.samplers.unipc import UniPCState, unipc_init, unipc_step
from editanything_tpu.samplers.plms import PLMSState, plms_init, plms_step
from editanything_tpu.samplers.dpm import (DPMState, dpm_init, dpm_step,
                                           SinglestepPlan, singlestep_plan,
                                           singlestep_init, singlestep_step)
