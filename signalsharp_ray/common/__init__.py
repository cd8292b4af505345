from .constants import (
    DEFAULT_EPSILON,
    STRICT_EPSILON,
    DEFAULT_RELATIVE_EPSILON,
    VARIANCE_EPSILON,
)
from .exceptions import (
    SignalSharpRayError,
    UninitializedDataError,
    SegmentLengthError,
    CostFunctionError,
    PELTAlgorithmError,
)

__all__ = [
    "DEFAULT_EPSILON",
    "STRICT_EPSILON",
    "DEFAULT_RELATIVE_EPSILON",
    "VARIANCE_EPSILON",
    "SignalSharpRayError",
    "UninitializedDataError",
    "SegmentLengthError",
    "CostFunctionError",
    "PELTAlgorithmError",
]
