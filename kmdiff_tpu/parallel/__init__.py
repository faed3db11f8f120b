"""Multi-chip / multi-host scaling layer.

The reference is single-node multithreaded (thread pool over partitions,
SURVEY.md §2.3); here the same partition/row axis shards over a
jax.sharding.Mesh: each device processes row blocks of the partition x
sample count matrices, with counters and totals reduced via psum over ICI.
"""

from kmdiff_tpu.parallel.mesh import make_mesh  # noqa: F401
from kmdiff_tpu.parallel.diff_step import make_sharded_diff_step  # noqa: F401
