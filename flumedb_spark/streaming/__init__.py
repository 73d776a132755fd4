from .live import LiveViewRunner, stream_log

__all__ = ["LiveViewRunner", "stream_log"]
