from .codec_io import CodecIO
from .kodak import evaluate_kodak
