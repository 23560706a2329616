from .text_encoder import (
    TextConfig,
    TextTransformer,
    MLMHead,
    cross_entropy,
    per_sample_lm_loss,
    gather_positions,
    roberta_position_ids,
)
from .beit2 import BeitVisionTransformer, VisionConfig, relative_position_index
from .clip_vit import ClipVisionTransformer, ClipVisionConfig
from .deit import DeitVisionTransformer, DeitConfig
from .xfm import XFMBase, XFMConfig, MLPHead, config_from_yaml
from .task_models import (
    XFMForPretrain,
    XFMForRetrieval,
    XFMForNLVR,
    XFMForClassification,
    TextClassifier,
    XFMForGrounding,
    DeepMLPHead,
)
from .generation import (XFMForVQA, XFMForCaptioning, generate,
                         beam_generate, make_decoder_config, shift_lm_loss)
from .vqkd import VQKD, VQKDConfig, NormEMAQuantizer
from .swin import SwinTransformer, SwinConfig
from . import losses
