from .domain import DomainDecomposer, local_abs_tol  # noqa: F401
from .sharded import ShardedCompressor  # noqa: F401
