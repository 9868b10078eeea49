"""The helix-tpu database engine: storage, indexes, and the interpreter."""

from .engine import Engine  # noqa: F401
from .errors import EngineError, ParamError, QueryError, WriteError  # noqa: F401
