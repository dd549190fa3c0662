"""Vector input configuration.

Behavioral parity with the reference's pydantic model
(``/root/reference/src/h3_indexer/data_model/vector.py:59-298``): same
fields, same enums, same rejection rules — re-expressed as plain
dataclasses (no pydantic dependency). Every ``raise ValueError`` branch
below mirrors a reference validator branch (cited per rule); the config
unit tests exercise each one.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import TYPE_CHECKING, Optional, Union

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


class GeometryType(str, Enum):
    """Vector geometry kinds (reference vector.py:19-24)."""

    POINT = "POINT"
    LINE = "LINE"
    POLYGON = "POLYGON"


class AllocationMethod(str, Enum):
    """How a feature's attributes are allocated to H3 cells
    (reference vector.py:27-44). ``PASS_THROUGH`` and ``CENTROID`` are
    declared by the reference but have no implementation branch
    (h3_indexer.py:193,257) — we implement all five."""

    WITHIN = "WITHIN"  # POINT
    PCT_LENGTH = "PCT_LENGTH"  # LINE
    PASS_THROUGH = "PASS_THROUGH"  # LINE
    PCT_AREA = "PCT_AREA"  # POLYGON
    CENTROID = "CENTROID"  # POLYGON


METHODS_FOR_GEOMETRY: dict[GeometryType, tuple[AllocationMethod, ...]] = {
    GeometryType.POINT: (AllocationMethod.WITHIN,),
    GeometryType.LINE: (AllocationMethod.PCT_LENGTH, AllocationMethod.PASS_THROUGH),
    GeometryType.POLYGON: (AllocationMethod.PCT_AREA, AllocationMethod.CENTROID),
}


@dataclass
class InputColumn:
    """Attribute column descriptor (reference vector.py:47-56)."""

    name: str
    type: Optional[str] = None


def _coerce_input_columns(
    cols: list[Union[str, InputColumn, dict]],
) -> list[InputColumn]:
    """Bare strings / dicts → InputColumn (reference vector.py:259-270)."""
    out: list[InputColumn] = []
    for item in cols:
        if isinstance(item, InputColumn):
            out.append(item)
        elif isinstance(item, str):
            out.append(InputColumn(name=item))
        elif isinstance(item, dict):
            out.append(InputColumn(**item))
        else:
            raise ValueError(f"invalid input_columns entry: {item!r}")
    return out


@dataclass
class VectorTable:
    """One named vector input of a job (reference vector.py:59-103).

    ``path`` generalizes the reference's ``s3_path`` (local paths work
    too); ``catalog_database``/``catalog_table`` generalize the Glue
    catalog source to any Spark-catalog table or registered temp view.
    """

    id: str
    job_id: str
    unique_id: str
    geometry_type: GeometryType
    method: AllocationMethod
    input_columns: list[InputColumn] = field(default_factory=list)
    type: str = "vector"
    path: Optional[str] = None
    catalog_database: Optional[str] = None
    catalog_table: Optional[str] = None
    where_clause: Optional[str] = None
    # JDBC endpoint for the catalog source (reference validator.py:80-94
    # read Athena over JDBC); None → Spark catalog / temp view.
    jdbc_url: Optional[str] = None
    geometry_column_name: Optional[str] = None
    lat_column_name: Optional[str] = None
    lon_column_name: Optional[str] = None
    # Mutable runtime slots (reference vector.py:96-97).
    df: Optional["DataFrame"] = None
    h3_indexed_df: Optional["DataFrame"] = None

    def __post_init__(self) -> None:
        self.geometry_type = GeometryType(self.geometry_type)
        self.method = AllocationMethod(self.method)
        self.input_columns = _coerce_input_columns(self.input_columns)
        if self.catalog_database:
            self.catalog_database = self.catalog_database.lower()
        if self.catalog_table:
            self.catalog_table = self.catalog_table.lower()
        self._check_source()
        self._check_method()
        self._check_geometry_columns()

    # --- validation rules -------------------------------------------------

    def _check_source(self) -> None:
        """path XOR catalog source; where_clause only with catalog
        (reference vector.py:138-179)."""
        has_path = self.path is not None
        has_catalog = (
            self.catalog_database is not None and self.catalog_table is not None
        )
        half_catalog = (self.catalog_database is None) != (self.catalog_table is None)
        if self.where_clause is not None and not has_catalog:
            raise ValueError(
                "'where_clause' requires a catalog source, not a file path"
            )
        if half_catalog:
            raise ValueError(
                "'catalog_database' and 'catalog_table' must be provided together"
            )
        if has_path and has_catalog:
            raise ValueError("provide either 'path' or a catalog source, not both")
        if not has_path and not has_catalog:
            raise ValueError("either 'path' or a catalog source is required")

    def _check_method(self) -> None:
        """Method ↔ geometry compatibility (reference vector.py:224-257)."""
        allowed = METHODS_FOR_GEOMETRY[self.geometry_type]
        if self.method not in allowed:
            raise ValueError(
                f"{self.geometry_type.value} geometry only accepts methods: "
                f"{[m.value for m in allowed]}"
            )

    def _check_geometry_columns(self) -> None:
        """Geometry column rules per geometry type (reference
        vector.py:272-298)."""
        if self.geometry_type in (GeometryType.LINE, GeometryType.POLYGON):
            if not self.geometry_column_name:
                raise ValueError(
                    f"geometry_column_name is required for "
                    f"{self.geometry_type.value} geometry"
                )
            if self.lat_column_name or self.lon_column_name:
                raise ValueError(
                    f"lat/lon columns are not allowed for "
                    f"{self.geometry_type.value} geometry"
                )
        else:  # POINT
            has_latlon = self.lat_column_name or self.lon_column_name
            if self.geometry_column_name and has_latlon:
                raise ValueError(
                    "POINT geometry takes geometry_column_name OR lat/lon "
                    "columns, not both"
                )
            if bool(self.lat_column_name) != bool(self.lon_column_name):
                raise ValueError(
                    "lat_column_name and lon_column_name must be provided "
                    "together"
                )
            if not self.geometry_column_name and not has_latlon:
                raise ValueError(
                    "POINT geometry requires geometry_column_name or lat/lon "
                    "columns"
                )

    # --- helpers ----------------------------------------------------------

    @property
    def input_column_names(self) -> list[str]:
        return [c.name for c in self.input_columns]

    @property
    def source_description(self) -> str:
        if self.path:
            return self.path
        return f"{self.catalog_database}.{self.catalog_table}"
