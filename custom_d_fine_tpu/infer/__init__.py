from .model import JaxModel

__all__ = ["JaxModel"]
