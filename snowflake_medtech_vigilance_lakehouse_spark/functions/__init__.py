"""Expression helpers: Snowflake-dialect semantics on Spark built-ins.

Kept as *Column -> Column* functions (not UDFs) so every expression
stays JVM-side inside whole-stage codegen.
"""

from .scalar import (  # noqa: F401
    nullif_blank,
    norm_upper,
    parse_yyyymmdd,
    quarter_label,
    quarter_index,
    normalize_event_type,
    keyword_classifier,
    sha2_key,
)
from .aggregates import (  # noqa: F401
    ordered_listagg,
    first_non_blank,
    max_if,
)
from .vectors import (  # noqa: F401
    dot,
    l2_norm,
    cosine_similarity,
)
