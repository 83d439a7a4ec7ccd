"""Sources & sinks (scans, storage layout, exports, ingest, views)."""

from .exports import bin_records, export, export_arrow_ipc, to_geojson_rows  # noqa: F401
from .ingest import apply_converter, ingest_delimited, ingest_json  # noqa: F401
from .parquet_scan import density_scan, scan_parquet_arrow  # noqa: F401
from .storage import read_pruned, write_partitioned  # noqa: F401
from .views import merged_store_view, routed_view  # noqa: F401
