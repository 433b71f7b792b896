from .state import TrainState  # noqa: F401
from .experiment import VQVAEExperiment, build_experiment_from_yaml  # noqa: F401
