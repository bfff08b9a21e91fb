"""Distributed execution: device meshes and shard_map collectives.

Reference behavior: Horovod allreduce (hvd.DistributedOptimizer grad hooks,
broadcast_parameters; SURVEY.md §3.3, §6.8). TPU-native replacement: a
``jax.sharding.Mesh`` with a ``data`` axis (and optional ``model`` axis for
output-layer tensor parallelism), ``shard_map`` + ``lax.psum`` over ICI —
collectives are compiled into the step program, no external library.
"""

from pykaldi2_tpu.parallel.mesh import make_mesh, local_batch_sharding
from pykaldi2_tpu.parallel.data_parallel import psum_mean, replicate
