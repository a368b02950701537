from .octree import AdaptiveMesh
from . import generators
