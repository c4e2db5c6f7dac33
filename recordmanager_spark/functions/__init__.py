from . import keys, text

__all__ = ["keys", "text"]
