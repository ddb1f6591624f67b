from . import (audio, dataio, metrics, profiling, serialize,  # noqa: F401
               testsig)
