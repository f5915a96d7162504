from .penalties import run_build  # noqa: F401
from .staffing_metrics import run_staffing_metrics  # noqa: F401
