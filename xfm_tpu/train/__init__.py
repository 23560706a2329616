from .optim import create_optimizer, create_optimizer_from_config, lars, decay_mask, boost_mask
from .schedules import linear_warmup_decay, half_cosine, schedule_from_config
from .train_state import TrainState, create_sharded_state, make_train_step
