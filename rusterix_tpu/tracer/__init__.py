from .tracer import AccumBuffer, Tracer

__all__ = ["AccumBuffer", "Tracer"]
