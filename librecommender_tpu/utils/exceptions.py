"""Framework exceptions. Reference parity: libreco/utils/exception.py."""


class NotSamplingError(Exception):
    """Raised when computing evaluation metrics that require negative sampling."""
