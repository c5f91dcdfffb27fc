from .batcher import StreamHandle, StreamingBatcher

__all__ = ["StreamHandle", "StreamingBatcher"]
