"""Physics operators: stencil constructors from gauge links.

Reference parity: operators/gaugedlaplace.h, operators/staggered.h,
operators/wilson.h, operators/dwf.h, operators/coarse.h, plus the
test-local FreeLaplace2D (tests/n02_free_laplace_test/free_laplace.h).
"""

from .laplace import FreeLaplace2D, GaugedLaplace2D
from .staggered import Staggered2D
from .wilson import Wilson2D
from .coarse import CoarseOperator2D, build_coarse_coeffs
from .dwf import Dwf2D, create_dwf_ls
