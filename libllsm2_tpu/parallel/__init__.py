from . import corpus, mesh, seqparallel  # noqa: F401
from .corpus import batched_pipeline, run_corpus  # noqa: F401
from .mesh import make_mesh, shard_batch  # noqa: F401
