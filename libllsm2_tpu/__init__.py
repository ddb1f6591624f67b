"""libllsm2_tpu: a TPU-native speech analysis/modification/synthesis
framework with the capabilities of Sleepwalking/libllsm2, built from
scratch on JAX/XLA/Pallas.  See SURVEY.md for the reference layer map this
framework mirrors and README.md for the design."""

from .config import (AnalysisOptions, ChunkConf, SynthesisOptions,
                     create_aoptions, create_soptions)
from .container import (Chunk, create_chunk, cumulative_cycles,
                        phase_propagate, phase_sync)

__version__ = "0.1.0"

from .container import phase_shift

__all__ = [
    "AnalysisOptions", "ChunkConf", "SynthesisOptions",
    "create_aoptions", "create_soptions",
    "Chunk", "create_chunk", "cumulative_cycles",
    "phase_propagate", "phase_shift", "phase_sync",
    "analyze", "synthesize", "analyze_batch", "synthesize_batch",
]


def analyze(*args, **kw):
    from .models.layer0 import analyze as _a
    return _a(*args, **kw)


def synthesize(*args, **kw):
    from .models.layer0 import synthesize as _s
    return _s(*args, **kw)


def analyze_batch(*args, **kw):
    from .models.layer0 import analyze_batch as _a
    return _a(*args, **kw)


def synthesize_batch(*args, **kw):
    from .models.layer0 import synthesize_batch as _s
    return _s(*args, **kw)
