from .queries import ORACLE, ORACLE_EXTRA, QUERIES, QUERIES_EXTRA  # noqa: F401
from . import queries_text  # noqa: F401  (registers text/dedup/similarity queries)
from . import queries_ml  # noqa: F401  (registers KMeans/IsolationForest queries)
from . import queries_streaming  # noqa: F401  (registers Structured Streaming queries)
from . import queries_misc  # noqa: F401  (registers sampling/set-op/cube/audit queries)
from . import queries_temporal  # noqa: F401  (registers as-of join / sessionization queries)
from . import queries_training  # noqa: F401  (registers chunk/pack, PII, LM, boilerplate, split queries)
from . import queries_rules  # noqa: F401  (registers Gopher/C4 rule-filter queries)
from . import queries_passages  # noqa: F401  (registers duplicate-passage dedup)
