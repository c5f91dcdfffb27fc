from .batcher import StreamHandle, StreamingBatcher
from .live import LiveSession

__all__ = ["LiveSession", "StreamHandle", "StreamingBatcher"]
