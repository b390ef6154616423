from .report import aggregate_ensemble_results  # noqa: F401
from .plot import plot_learning_curves  # noqa: F401
