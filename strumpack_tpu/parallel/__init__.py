"""Mesh-distributed execution (the reference's MPI layer, TPU-native)."""
from .driver import DistributedSparseSolver          # noqa: F401
from .structured_dist import (construct_from_dense_dist,      # noqa: F401
                              construct_from_elements_dist,
                              DistBLR, DistHSS)
