"""Type aliases (reference-API parity: models/types_.py)."""

import jax

Array = jax.Array
Tensor = jax.Array  # the reference's torch-centric alias, kept for imports
