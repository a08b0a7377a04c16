from .asof import asof_join  # noqa: F401
from .windows import top_k_per_group, sessionize  # noqa: F401
