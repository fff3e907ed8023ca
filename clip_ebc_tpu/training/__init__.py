from .optim import make_optimizer, make_schedule
from .schedule import warmup_cosine_restarts
from .state import TrainState
from .trainer import Trainer, make_train_step
