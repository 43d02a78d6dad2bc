from .meters import AverageMeter, WeightedMeter
from .state import CodecTrainState, make_train_state
from .checkpoint import save_checkpoint, load_checkpoint, save_rotating, step_from_path
