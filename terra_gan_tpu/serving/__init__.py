"""Production inference serving (HTTP + dynamic micro-batching) and
AOT StableHLO export artifacts."""

from .client import InpaintClient, ServingError
from .export import (
    describe,
    export_generator,
    load_exported,
    save_exported,
    serialize_generator,
)
from .server import InpaintService, MicroBatcher, make_server

__all__ = [
    "InpaintClient",
    "InpaintService",
    "MicroBatcher",
    "ServingError",
    "make_server",
    "describe",
    "export_generator",
    "load_exported",
    "save_exported",
    "serialize_generator",
]
