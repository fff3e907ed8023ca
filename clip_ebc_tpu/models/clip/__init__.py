from .clip_model import Clip
from .image_encoder import ClipModifiedResNet, ClipViT
from .model import ClipEBC, build_clip_ebc
from .prompts import bin_prompts, format_count, num2word
from .text_encoder import ClipTextEncoder
from .tokenizer import ClipTokenizer, get_tokenizer, tokenize
