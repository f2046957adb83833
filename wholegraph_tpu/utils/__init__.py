from .error import (
    ErrorCode,
    InvalidInput,
    InvalidValue,
    LogicError,
    NotSupported,
    WholeGraphError,
    check,
    check_input,
)
from .logger import debug, error, info, logger, set_log_level, trace, warn
from .dtypes import as_jax_dtype, as_numpy_dtype, element_size, is_floating, is_integer

__all__ = [
    "ErrorCode",
    "InvalidInput",
    "InvalidValue",
    "LogicError",
    "NotSupported",
    "WholeGraphError",
    "check",
    "check_input",
    "debug",
    "error",
    "info",
    "logger",
    "set_log_level",
    "trace",
    "warn",
    "as_jax_dtype",
    "as_numpy_dtype",
    "element_size",
    "is_floating",
    "is_integer",
]
