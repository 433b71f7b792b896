"""Legacy shims (reference-API parity: utils.py).

The reference carried a `data_loader` decorator papering over an ancient
PyTorch-Lightning API change; it was unused dead code (SURVEY.md C20). The
equivalent surface here is a deprecation-warning identity decorator, kept
so imports of the historical name keep working.
"""

from __future__ import annotations

import warnings


def data_loader(fn):
    """Deprecated no-op decorator (the Lightning 0.6 shim of the reference).

    This framework's loaders are plain iterables; decorate nothing.
    """
    warnings.warn(
        "data_loader is a legacy no-op shim kept for API parity; "
        "return the loader directly instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    return fn
