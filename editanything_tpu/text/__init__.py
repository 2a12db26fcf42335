from editanything_tpu.text.tokenizer import CLIPTokenizer
