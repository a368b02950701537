from .poisson import PoissonProblem, gaussian_solution, gaussian_rhs
