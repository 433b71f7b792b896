from . import geometry, kabsch, losses, masking  # noqa: F401
