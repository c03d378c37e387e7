"""stgx — a TPU-native spatial-temporal GNN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
maximyudayev/Realtime-ST-GCN (continual skeleton-based action segmentation):
the ST-GCN model family, K-partitioned skeleton graph convolutions with
learnable edge-importance, streaming (per-frame FIFO) inference, the
unequal-length long-sequence training trick, segmental metrics, and an int8
benchmarking path — designed TPU-first: MXU-shaped einsums, `lax.scan`
streaming carries, Pallas kernels for the hot ops, and a GSPMD
``(data, seq)`` mesh in place of DataParallel segment scattering.

Layout (reference layer map in SURVEY.md §1):
  stgx.graph      skeleton graph builder (partitioning + normalization)
  stgx.ops        core compute ops: graph conv, temporal conv, norms, shift
  stgx.models     model zoo: stgcn, rtstgcn, costgcn, aagcn, mstcn, msgcn, shiftgcn
  stgx.parallel   device mesh, sequence sharding/halo exchange, train step
  stgx.utils      config, loss, statistics, segmental metrics, checkpointing
  stgx.data       datasets (mmap .npy file / per-trial dir), converters
"""

__version__ = "0.1.0"

from stgx.graph import Graph, load_skeleton  # noqa: F401
