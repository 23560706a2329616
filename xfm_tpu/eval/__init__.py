from . import glue_metrics
from . import vqa_eval
from . import caption_metrics
from .cider import CiderD
