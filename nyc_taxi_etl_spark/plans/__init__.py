from .queries import ORACLE, QUERIES  # noqa: F401
from . import queries_text  # noqa: F401  (registers text/dedup/similarity queries)
