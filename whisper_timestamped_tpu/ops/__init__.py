from .median import median_filter_last_axis  # noqa: F401
from .dtw import dtw_path, dtw_path_numpy, dtw_cost_jnp  # noqa: F401
from .peaks import find_peaks  # noqa: F401
