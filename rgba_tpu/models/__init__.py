from .mask_codec import MaskCodec
from .rgb_codec import RGBCodec, AnalysisTransform, SynthesisTransform
from .pipeline import RGBAPipeline
