from editanything_tpu.data.sam_dataset import SAMDataset, make_batcher
