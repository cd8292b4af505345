"""Exception hierarchy mirroring the reference's error surface.

Trigger conditions match /root/reference/SignalSharp/Common/Exceptions/
UninitializedDataException.cs, CostFunctions/Exceptions/ (SegmentLengthException,
CostFunctionException) and Detection/PELT/Exceptions/PELTAlgorithmException.cs.
"""


class SignalSharpRayError(Exception):
    """Base error for the engine."""


class UninitializedDataError(SignalSharpRayError):
    """fit() was not called before a method that requires fitted state."""


class SegmentLengthError(SignalSharpRayError):
    """A segment is shorter than the minimum required length."""

    @staticmethod
    def check(length: int, min_length: int = 1, message: str | None = None) -> None:
        if length < min_length:
            raise SegmentLengthError(
                message
                or f"Segment length {length} is below the minimum {min_length}."
            )


class CostFunctionError(SignalSharpRayError):
    """Unexpected failure inside a cost function."""


class PELTAlgorithmError(SignalSharpRayError):
    """Failure in the PELT driver (penalty selection, backtracking)."""
