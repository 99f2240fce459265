"""Source connectors: local file family (GeoJSON, Esri JSON, ZIP),
remote protocol connectors (ArcGIS REST, OGC API Features, WFS, Atom)
with partition-planned pagination, and staging file discovery."""

from .schema import FEATURE_SCHEMA

__all__ = ["FEATURE_SCHEMA"]
