from .cg import cg_solve
from .chebyshev import ChebyshevSmoother, estimate_eigenvalue_range
