from . import serde, text, vectors

__all__ = ["serde", "text", "vectors"]
