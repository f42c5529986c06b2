from .mesh import (data_parallel_mesh, replicate, shard_batch,
                   shard_host_local_batch)
from .stats import StatsCollector
