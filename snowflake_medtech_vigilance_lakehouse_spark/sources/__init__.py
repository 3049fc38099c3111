"""Source readers and table-format sinks."""

from .readers import (  # noqa: F401
    read_maude_raw_ndjson,
    read_seed_csv,
    load_tables,
    TESTDATA_TABLES,
)
from .writers import write_table  # noqa: F401
