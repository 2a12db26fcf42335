from editanything_tpu.models import config as config
from editanything_tpu.models import unet as unet
from editanything_tpu.models import controlnet as controlnet
from editanything_tpu.models import vae as vae
from editanything_tpu.models import clip_text as clip_text
