from .engine import InferenceEngine, InferenceResult, ServingConfig
from .server import make_server, serve_forever
from .streaming import StreamingConfig, StreamingResult, StreamingSession

__all__ = [
    "InferenceEngine",
    "InferenceResult",
    "ServingConfig",
    "StreamingConfig",
    "StreamingResult",
    "StreamingSession",
    "make_server",
    "serve_forever",
]
