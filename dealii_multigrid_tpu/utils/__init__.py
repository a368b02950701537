from .params import RunParameters, MultigridParameters
from .table import ConvergenceTable
