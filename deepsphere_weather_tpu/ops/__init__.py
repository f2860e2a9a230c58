"""TPU compute kernels: Chebyshev graph conv, pooling, equiangular conv."""

from .cheb import ChebOperator, cheb_conv, ell_matvec  # noqa: F401
from .conv2d import equiangular_conv2d  # noqa: F401
from .pool import (  # noqa: F401
    EllMatrix,
    build_pool_unpool,
    sparse_to_ell,
)
from .pallas_spmm import BlockSparseOperator  # noqa: F401
