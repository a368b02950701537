from . import tensor, element
