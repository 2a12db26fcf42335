from editanything_tpu.pipelines.bundle import (ModelBundle, random_bundle,
                                               load_bundle)
from editanything_tpu.pipelines.generate import (GenerationPipeline,
                                                 ProgramCache, to_uint8)
from editanything_tpu.pipelines.edit import (EditPipeline,
                                             make_inpaint_condition)
from editanything_tpu.pipelines.sketch import (SketchPipeline,
                                               sketch_condition)
from editanything_tpu.pipelines.captioner import (Captioner,
                                                  semantic_labels)
from editanything_tpu.pipelines.editor import EditAnythingEditor
from editanything_tpu.pipelines.img2img import Img2ImgPipeline
