from .base import HostDataPipeline
from .image_pair import ImagePairDataset
from .keypoint import VideoFramesDataset
from .sequence import SequenceDataset
from .synthetic import make_synthetic_penn_tree

__all__ = [
    "HostDataPipeline",
    "ImagePairDataset",
    "SequenceDataset",
    "VideoFramesDataset",
    "make_synthetic_penn_tree",
]
