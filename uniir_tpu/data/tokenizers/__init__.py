from uniir_tpu.data.tokenizers.clip_bpe import CLIPTokenizer
from uniir_tpu.data.tokenizers.bert_wordpiece import BertTokenizer
