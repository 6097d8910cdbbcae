from mvlpt_tpu.tokenizer.bpe import (
    ClipBpeTokenizer,
    get_tokenizer,
    tokenize,
    download_bpe_vocab,
    find_bpe_vocab,
)
