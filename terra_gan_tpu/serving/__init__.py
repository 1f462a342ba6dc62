"""Production inference serving (HTTP + dynamic micro-batching)."""

from .server import InpaintService, MicroBatcher, make_server

__all__ = ["InpaintService", "MicroBatcher", "make_server"]
