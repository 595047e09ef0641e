"""Codec models: jit-compiled end-to-end pipelines."""

from .codec import CodecMetrics, HGICodec

__all__ = ["HGICodec", "CodecMetrics"]
