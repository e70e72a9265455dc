"""Layer model for the raster data environment.

Reference: app/models/pydantic/raster_analysis.py:14-28 (SourceLayer /
DerivedLayer), asset_metadata RasterTable; layer-name and derived-layer
rules app/routes/datasets/queries.py:628-787:

- source layer name: ``{dataset}__{pixel_meaning}`` (or ``is__{dataset}``
  for boolean ``is`` layers)
- ``date_conf`` layers derive ``__date`` (``A % 10000`` days since
  2015-01-01, decoded to ISO date strings) and ``__confidence``
  (``floor(A / 10000)`` with value table 2=nominal 3=high 4=highest,
  default ``not_detected``)
- area-density suffixes (``_ha-1`` …) derive a gross layer ``A * area``
- predefined: ``whrc_aboveground_co2_emissions__Mg`` =
  ``A * area * (0.5 * 44 / 12)`` over the biomass layer
"""

from __future__ import annotations

from dataclasses import dataclass, field

# suffixes the reference treats as per-area densities (queries.py:69-70)
AREA_DENSITY_RASTER_SUFFIXES = ["_ha-1", "_ha_yr-1"]

DATE_CONF_EPOCH = "2015-01-01"


@dataclass
class RasterTableRow:
    value: int
    meaning: str


@dataclass
class RasterTable:
    rows: list[RasterTableRow] = field(default_factory=list)
    default_meaning: str | None = None


@dataclass
class SourceLayer:
    name: str
    source_uri: str  # parquet pixel table path
    grid: str
    no_data: float | int | None = None
    raster_table: RasterTable | None = None
    tile_scheme: str = "nw"


@dataclass
class DerivedLayer:
    name: str
    source_layer: str
    calc: str  # NumPy expression over A (and `area`)
    no_data: float | int | None = None
    raster_table: RasterTable | None = None
    decode_as_date: bool = False  # __date layers decode to ISO date strings


Layer = SourceLayer | DerivedLayer


def area_density_base_name(name: str) -> str:
    """Strip a density suffix, or '' if not a density layer
    (queries.py:628-634 _get_area_density_name)."""
    for suffix in AREA_DENSITY_RASTER_SUFFIXES:
        if name.endswith(suffix):
            return name[: -len(suffix)]
    return ""


def source_layer_name(dataset: str, pixel_meaning: str) -> str:
    if pixel_meaning == "is":
        return f"is__{dataset}"
    return f"{dataset}__{pixel_meaning}"


def default_layer_name(dataset: str, pixel_meaning: str) -> str:
    """The layer the virtual table ``data`` binds to (queries.py:637-651)."""
    if pixel_meaning == "is":
        return f"is__{dataset}"
    if "date_conf" in pixel_meaning:
        return f"{dataset}__date"
    base = area_density_base_name(pixel_meaning)
    if base:
        return f"{dataset}__{base}"
    return f"{dataset}__{pixel_meaning}"


def encode_date(date_iso: str) -> int:
    """Encode an ISO date as days since 2015-01-01 — the inverse of the
    date layer's decode (reference encode_expression, queries.py:731-734;
    round-trip tested like test_query.py:845-864)."""
    import datetime

    epoch = datetime.date.fromisoformat(DATE_CONF_EPOCH)
    return (datetime.date.fromisoformat(date_iso) - epoch).days


def decode_date(days: int) -> str:
    import datetime

    epoch = datetime.date.fromisoformat(DATE_CONF_EPOCH)
    return (epoch + datetime.timedelta(days=int(days))).isoformat()


CONF_ENCODING = RasterTable(
    rows=[
        RasterTableRow(2, "nominal"),
        RasterTableRow(3, "high"),
        RasterTableRow(4, "highest"),
    ],
    default_meaning="not_detected",
)


def date_conf_derived_layers(source: str, no_data: float | int | None) -> list[DerivedLayer]:
    """__date + __confidence derivations (queries.py:721-760)."""
    return [
        DerivedLayer(
            name=source.replace("__date_conf", "__date"),
            source_layer=source,
            calc="A % 10000",
            no_data=no_data,
            decode_as_date=True,
        ),
        DerivedLayer(
            name=source.replace("__date_conf", "__confidence"),
            source_layer=source,
            calc="floor(A / 10000)",
            no_data=no_data,
            raster_table=CONF_ENCODING,
        ),
    ]


def area_density_derived_layer(source: str, no_data: float | int | None) -> DerivedLayer:
    """Gross layer for density sources (queries.py:763-774)."""
    return DerivedLayer(
        name=area_density_base_name(source),
        source_layer=source,
        calc="A * area",
        no_data=no_data,
    )


def predefined_derived_layers(source: str) -> list[DerivedLayer]:
    """Hardcoded analysis layers (queries.py:777-787)."""
    if source == "whrc_aboveground_biomass_stock_2000__Mg_ha-1":
        return [
            DerivedLayer(
                name="whrc_aboveground_co2_emissions__Mg",
                source_layer=source,
                calc="A * area * (0.5 * 44 / 12)",
            )
        ]
    return []
