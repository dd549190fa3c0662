"""Canonical internal column names.

Parity with the reference's data contract
(``/root/reference/src/h3_indexer/constants.py:3-20``): same public
column names so a user of the reference sees identical output schemas.
We drop ``geometry_geojson``/``h3_geom`` (Sedona-specific carriers) —
our canonical geometry representation is WKT strings end-to-end.
"""

# Geometry carrier column (WKT string) — the engine's lingua franca.
GEOM_WKT = "geom_wkt"

# H3 output columns (reference constants.py:10-20).
H3_INDEX = "h3_index"  # hex-string H3 cell id
H3_RESOLUTION = "h3_resolution"  # int literal, the job's resolution
H3_R3_PARENT = "h3_r3_parent"  # resolution-3 ancestor (partition key)
H3_AREA_KM2 = "h3_area_km2"  # spherical cell area
RATIO = "ratio"  # allocation fraction of feature in cell

# Method-specific metric columns (reference h3_indexer.py:140,202,266).
TOTAL_COUNT = "total_count"
TOTAL_LENGTH_KM = "total_length_km"
TOTAL_AREA_KM2 = "total_area_km2"

# Internal-only: 64-bit H3 cell id (cheap parent/bit ops; hex string is
# derived for output parity).
H3_LONG = "_h3_long"

# Resolver output prefix (reference h3_resolver.py:37).
SUM_PREFIX = "sum_"

# Partition columns of the parquet sink (reference main.py:63-64).
OUTPUT_PARTITION_COLS = (H3_RESOLUTION, H3_R3_PARENT)

# Numeric Spark types accepted for attribute columns
# (reference validator.py:48).
NUMERIC_TYPE_NAMES = frozenset(
    {"byte", "short", "integer", "long", "float", "double", "decimal"}
)
