from .final import FinalGenerator
from .server import InferenceEngine, MicroBatcher, make_server

__all__ = ["FinalGenerator", "InferenceEngine", "MicroBatcher", "make_server"]
