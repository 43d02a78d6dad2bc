from .config import TrainConfig, load_config
from .precision import Policy, DEFAULT_POLICY
