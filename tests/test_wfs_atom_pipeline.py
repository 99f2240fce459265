"""WFS connector, Atom routing, and the full config-driven pipeline."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from op_etl_spark.functions.xml_guards import safe_xml_parse
from op_etl_spark.plans.pipeline import Pipeline
from op_etl_spark.sources.atom import detect_service_kind, parse_feed
from op_etl_spark.sources.wfs import (
    build_wfs_params,
    discover_typenames,
    read_wfs,
)

# --- WFS mock ---

def wfs_mock(url: str, params: dict) -> str:
    if params.get("request") == "GetCapabilities":
        return """<WFS_Capabilities xmlns="http://www.opengis.net/wfs/2.0">
          <FeatureTypeList>
            <FeatureType><Name>ms:naturreservat</Name></FeatureType>
            <FeatureType><Name>ms:vattenskydd</Name></FeatureType>
          </FeatureTypeList></WFS_Capabilities>"""
    tn = params["typeNames"]
    if tn == "ms:gml_only":
        return """<FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2">
          <member><f><gml:Point><gml:pos>500000 6500000</gml:pos></gml:Point></f></member>
          <member><f><gml:LineString>
            <gml:posList>500000 6500000 500100 6500100 500200 6500050</gml:posList>
          </gml:LineString></f></member>
        </FeatureCollection>"""
    return json.dumps({
        "type": "FeatureCollection",
        "crs": {"type": "name", "properties": {"name": "EPSG:3006"}},
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [500000.0 + i, 6500000.0]},
             "properties": {"typ": tn, "i": i}}
            for i in range(3)
        ],
    })


def test_wfs_params_pushdown():
    p = build_wfs_params("ms:x", (1, 2, 3, 4), "EPSG:3006")
    assert p["typeNames"] == "ms:x"
    assert p["bbox"] == "1,2,3,4,EPSG:3006"
    assert p["outputFormat"] == "application/json"


def test_wfs_discovery():
    assert discover_typenames(wfs_mock, "http://mock/wfs") == [
        "ms:naturreservat", "ms:vattenskydd",
    ]


def test_wfs_getfeature(spark):
    df = read_wfs(
        spark, "http://mock/wfs", ["ms:naturreservat", "ms:vattenskydd"],
        "lst_wfs", "LST", text_fetcher=wfs_mock,
    )
    rows = df.collect()
    assert len(rows) == 6
    assert all(r.crs == 3006 for r in rows)
    assert {r["props"]["typ"] for r in rows} == {"ms:naturreservat", "ms:vattenskydd"}


def test_wfs_gml_fallback(spark):
    df = read_wfs(
        spark, "http://mock/wfs", ["ms:gml_only"], "gml_src", "LST",
        text_fetcher=wfs_mock,
    )
    rows = sorted(df.collect(), key=lambda r: r.geom_type)
    assert [r.geom_type for r in rows] == ["LineString", "Point"]


# --- XML guards ---

def test_xml_entity_rejection():
    evil = '<!DOCTYPE x [<!ENTITY a "b">]><root>&a;</root>'
    assert safe_xml_parse(evil) is None
    assert safe_xml_parse("<root><a/></root>") is not None
    assert safe_xml_parse("not xml at all") is None


# --- Atom routing ---

ATOM_FEED = """<feed xmlns="http://www.w3.org/2005/Atom">
  <entry><title>Zipfil</title>
    <link rel="enclosure" type="application/zip" href="http://x/data.zip"/></entry>
  <entry><title>WFS source</title>
    <link href="http://x/geoserver/ows?service=WFS&amp;request=GetCapabilities"/></entry>
  <entry><title>OGC source</title>
    <link href="http://x/ogc/features/v1/collections"/></entry>
  <entry><title>REST source</title>
    <link href="http://x/arcgis/rest/services/Y/FeatureServer"/></entry>
</feed>"""


def test_atom_routing():
    routes = parse_feed(ATOM_FEED, filter_services=True)
    kinds = {r.kind for r in routes}
    assert kinds == {"file", "wfs", "ogc", "rest"}
    no_filter = parse_feed(ATOM_FEED, filter_services=False)
    assert [r.kind for r in no_filter] == ["file"]  # only the enclosure


def test_service_kind_detection():
    assert detect_service_kind("http://x/a?service=WFS") == "wfs"
    assert detect_service_kind("http://x/collections/y/items") == "ogc"
    assert detect_service_kind("http://x/rest/services/F/FeatureServer/0") == "rest"
    assert detect_service_kind("http://x/file.zip") == "file"


# --- full pipeline ---

def test_pipeline_end_to_end(spark, tmp_path):
    import json as _json

    dl = tmp_path / "downloads"
    dl.mkdir()
    feats = [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [16.55 + i * 0.001, 59.15]},
         "properties": {"idx": i}}
        for i in range(20)
    ]
    (dl / "nvv_a.geojson").write_text(_json.dumps(
        {"type": "FeatureCollection", "features": feats}))

    cfg = {
        "workspaces": {"downloads": str(dl), "staging": str(tmp_path / "ws")},
        "sources": [
            {"name": "nvv_a", "out_name": "nvv_a", "authority": "NVV",
             "type": "file", "url": None, "enabled": True, "raw": {}},
            {"name": "broken", "out_name": "broken", "authority": "MSB",
             "type": "rest", "url": "http://nope", "enabled": True, "raw": {}},
        ],
        # AOI covering all the points (SWEREF99 TM, around lon 16.55 lat 59.15)
        "geoprocessing": {"aoi_bbox": [560000, 6540000, 600000, 6580000]},
    }

    def file_connector(spark_, src):
        from op_etl_spark.sources.geojson import read_feature_files

        return read_feature_files(
            spark_, [{"path": str(dl / "nvv_a.geojson"),
                      "source_name": src["name"], "authority": src["authority"]}]
        )

    def failing_connector(spark_, src):
        raise ConnectionError("connection refused by mock")

    pipe = Pipeline(spark, cfg, {"file": file_connector, "rest": failing_connector})
    result = pipe.run(str(tmp_path / "ws"))

    loaded = spark.read.parquet(result["loaded"]["nvv_a"])
    assert loaded.count() == 20
    assert loaded.select("crs").distinct().first().crs == 3006
    assert "underlag_nvv" in result["loaded"]["nvv_a"]

    metrics = spark.read.json(result["metrics"])
    by_name = {r.name: r for r in metrics.collect()}
    assert by_name["nvv_a"].success
    assert not by_name["broken"].success
    assert by_name["broken"].error_type == "ConnectionError"
