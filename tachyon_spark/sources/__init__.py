from tachyon_spark.sources.csv_io import (
    export_csv,
    export_jsonl,
    import_csv,
    import_jsonl,
)
from tachyon_spark.sources.bucketed import (
    is_exchange_free_join,
    read_bucketed,
    write_bucketed,
)
from tachyon_spark.sources.line_protocol import (
    ingest_line_protocol,
    parse_graphite,
    parse_line_protocol,
    render_line_protocol,
)
from tachyon_spark.sources.openmetrics import (
    ingest_openmetrics,
    parse_openmetrics,
)
from tachyon_spark.sources.otlp import (
    ingest_otlp,
    parse_otlp_metrics,
    render_otlp_metrics,
)
from tachyon_spark.sources.remote_read import serve_remote_read
from tachyon_spark.sources.remote_write import (
    ingest_remote_write,
    parse_remote_write,
    render_remote_write,
)
from tachyon_spark.sources.stats import samples_file_stats

__all__ = [
    "import_csv",
    "export_csv",
    "import_jsonl",
    "export_jsonl",
    "ingest_openmetrics",
    "parse_line_protocol",
    "ingest_line_protocol",
    "render_line_protocol",
    "parse_graphite",
    "parse_openmetrics",
    "ingest_otlp",
    "parse_otlp_metrics",
    "render_otlp_metrics",
    "ingest_remote_write",
    "parse_remote_write",
    "render_remote_write",
    "serve_remote_read",
    "samples_file_stats",
    "write_bucketed",
    "read_bucketed",
    "is_exchange_free_join",
]
