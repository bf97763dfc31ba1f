"""Parallelism utilities: mesh construction and sharding helpers.

The reference's only parallelism is data-parallel DDP over NCCL
(SURVEY.md section 2.3); here that is a 1-D `data` mesh with batch-sharded
rays and replicated parameters — XLA derives the gradient psum over ICI
from the sharding annotations, and DCN only carries the per-host input
pipeline. There is no TP/PP/SP/EP/ring-attention because the workload has
no attention and no layer large enough to shard (documented non-goal,
SURVEY.md section 7.4).
"""

from .mesh import (batch_sharding, data_mesh, maybe_data_mesh,
                   replicated_sharding)

__all__ = ["data_mesh", "maybe_data_mesh", "batch_sharding",
           "replicated_sharding"]
