from .networks import (
    ConvEncoder,
    ImageDiscriminator,
    ImageEncoder,
    MotionGenerator,
    PoseEncoder,
    SeqDiscriminator,
    Stage1Generator,
    Translator,
)

__all__ = [
    "ConvEncoder",
    "ImageDiscriminator",
    "ImageEncoder",
    "MotionGenerator",
    "PoseEncoder",
    "SeqDiscriminator",
    "Stage1Generator",
    "Translator",
]
