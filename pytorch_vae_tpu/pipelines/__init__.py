from . import aeot, filtering  # noqa: F401
