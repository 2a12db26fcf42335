from editanything_tpu.utils.image import (
    HWC3,
    resize_image,
    resize_points,
    get_bounding_box,
)
