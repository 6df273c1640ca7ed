from .export import ServingArtifact, export_serving, load_serving
from .final import FinalGenerator
from .server import ArtifactEngine, InferenceEngine, MicroBatcher, make_server

__all__ = [
    "ArtifactEngine",
    "FinalGenerator",
    "InferenceEngine",
    "MicroBatcher",
    "ServingArtifact",
    "export_serving",
    "load_serving",
    "make_server",
]
