from .profiling import maybe_profile, phase_timer  # noqa: F401
