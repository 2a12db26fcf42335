from editanything_tpu.perception.amg import (
    AMGConfig,
    build_amg,
    encode_id_map,
)
from editanything_tpu.perception.predictor import SamPredictor
