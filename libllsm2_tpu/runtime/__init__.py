from . import native, rtsynth  # noqa: F401
from .rtsynth import RTSynthesizer, stream_chunk  # noqa: F401
