"""strumpack_tpu — TPU-native structured sparse solver framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of STRUMPACK
(sparse multifrontal LU with rank-structured front compression, outer Krylov
solvers, structured dense matrix algebra, kernel-matrix regression), designed
level-batched and mesh-sharded for TPUs.  See SURVEY.md for the reference
structural analysis this is built against.
"""

from .options import (BLROptions, CompressionType, EquilibrationType,
                      GramSchmidtType, HSSOptions, KrylovSolver, MatchingJob,
                      ReorderingStrategy, SPOptions)
from .solver import SparseSolver
from .sparse.csr import CSRMatrix
from .utils import params
from .utils.params import ReturnCode

# structured dense API (structured::StructuredMatrix facade)
from .structured.structured import (StructuredMatrix, StructuredOptions,
                                    construct_from_dense,
                                    construct_from_elements,
                                    construct_matrix_free,
                                    construct_partially_matrix_free)
from .structured.structured import Type as StructuredType
from .structured.hss import HSSMatrix
from .structured.hodlr import HODLRMatrix
from .structured.butterfly import ButterflyMatrix

# kernel-matrix machine learning
from .kernel.kernel import (ANOVAKernel, DenseKernel, GaussKernel,
                            KernelRegressionClassifier, LaplaceKernel)

__version__ = "0.1.0"

__all__ = [
    "SparseSolver", "SPOptions", "CSRMatrix", "ReturnCode",
    "ReorderingStrategy", "CompressionType", "MatchingJob", "KrylovSolver",
    "GramSchmidtType", "EquilibrationType", "BLROptions", "HSSOptions",
    "StructuredMatrix", "StructuredOptions", "StructuredType",
    "construct_from_dense", "construct_from_elements",
    "construct_matrix_free", "construct_partially_matrix_free",
    "HSSMatrix", "HODLRMatrix", "ButterflyMatrix",
    "GaussKernel", "LaplaceKernel", "ANOVAKernel", "DenseKernel",
    "KernelRegressionClassifier",
]
