from .block_masking import BlockMaskingGenerator
from .text_masking import TextMaskingGenerator
from .tokenization import build_tokenizer, SimpleTokenizer
from .jsonl import ShardedLineReader, split_shard
from .transforms import (TrainTransform, TestTransform, build_transforms,
                         decode_image, normalize, CLIP_MEAN, CLIP_STD)
from .pretrain_data import (ImageTextStream, TextStream, ImageStream,
                            RegionTextStream, TextPreprocessor, pre_caption,
                            PAD_MASK_LABEL)
from .prefetch import Prefetcher
from .randaugment import RandomAugment
from . import io
