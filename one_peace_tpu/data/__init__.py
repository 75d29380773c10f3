from .tokenizer import Dictionary, GPT2BPE, TextTokenizer, find_bpe_dir  # noqa: F401
