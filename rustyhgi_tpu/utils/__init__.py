"""Host-side utilities: containers, image I/O, profiling, bench suite."""

from . import benchsuite, container, imageio, profiling

__all__ = ["benchsuite", "container", "imageio", "profiling"]
