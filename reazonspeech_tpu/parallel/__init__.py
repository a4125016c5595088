from .mesh import make_mesh, shard_batch, shard_params
from .pipeline import (
    PipelineSpec,
    make_pipeline_mesh,
    pipeline_parallel_encode,
)
from .sequence import sequence_parallel_config, sequence_parallel_encode
from .serving import DataParallelDecoder

__all__ = [
    "DataParallelDecoder",
    "make_mesh",
    "make_pipeline_mesh",
    "PipelineSpec",
    "pipeline_parallel_encode",
    "shard_params",
    "shard_batch",
    "sequence_parallel_config",
    "sequence_parallel_encode",
]
