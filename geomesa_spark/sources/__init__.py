"""Sources & sinks (scans, storage layout, exports, ingest, views)."""

from .exports import (  # noqa: F401
    bin_records,
    export,
    export_arrow_ipc,
    export_gml,
    export_leaflet,
    export_shapefile,
    to_geojson_rows,
)
from .ingest import (  # noqa: F401
    apply_converter,
    ingest_avro,
    ingest_delimited,
    ingest_fixed_width,
    ingest_json,
    ingest_xml,
)
from .parquet_scan import density_scan, scan_parquet_arrow  # noqa: F401
from .storage import read_pruned, write_partitioned  # noqa: F401
from .views import merged_store_view, routed_view  # noqa: F401
