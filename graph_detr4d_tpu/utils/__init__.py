from .math import inverse_sigmoid  # noqa: F401
