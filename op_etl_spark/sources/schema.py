"""Canonical feature schema — the engine's core row type (SURVEY.md §1,
FIXTURES.md F1).

A feature is one row: WKB geometry + typed envelope + CRS column + a
string->string property map (schema-on-read; typed attribute columns are
derived later with from_json/cast, mirroring the reference's inferred
attribute model, etl/stage_files.py:190).

CRS is an ordinary INT column, not column metadata — SR-consistency checks
(reference etl/sr_utils.py:176-242) become plain filters and the value
survives shuffles, joins and writes.
"""

from __future__ import annotations

from pyspark.sql import types as T

BBOX_STRUCT = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType()),
        T.StructField("source_name", T.StringType()),
        T.StructField("authority", T.StringType()),
        T.StructField("geom_type", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("bbox", BBOX_STRUCT),
        T.StructField("crs", T.IntegerType()),
        T.StructField("props", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DDL = (
    "feature_id bigint, source_name string, authority string, "
    "geom_type string, geometry binary, "
    "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
    "crs int, props map<string,string>"
)
