from . import glue_metrics
