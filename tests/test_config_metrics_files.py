"""Config loader (bbox inheritance, validation), metrics rollup, file
discovery."""

from __future__ import annotations

import os
import time

import pytest

from op_etl_spark.config.loader import enabled_sources, load_config, normalize_source
from op_etl_spark.operators.metrics import (
    METRICS_SCHEMA,
    classify_error,
    rollup_by_source_type,
)
from op_etl_spark.sources.files import discover_files

CONFIG_YAML = """
workspaces:
  downloads: /tmp/dl
  staging: /tmp/staging
global_bbox:
  bbox_3006: [585826, 6550189, 648593, 6611661]
  bbox_crs84: [16.4, 59.0, 17.6, 59.6]
geoprocess:
  aoi_bbox: [585826, 6550189, 648593, 6611661]
"""

SOURCES_YAML = """
sources:
  - name: NVV Skyddad Natur
    authority: NVV
    type: rest
    url: http://example/FeatureServer
    raw:
      layer_ids: [0, 1]
  - name: SGU Jordarter
    authority: SGU
    type: ogc
    url: http://example/ogc
    raw:
      collections: [jordarter]
  - name: Disabled one
    authority: MSB
    type: rest
    url: http://example/x
    enabled: false
  - name: Own bbox
    authority: TRV
    type: wfs
    url: http://example/wfs
    raw:
      bbox: [1, 2, 3, 4]
"""


@pytest.fixture()
def cfg(tmp_path):
    c = tmp_path / "config.yaml"
    s = tmp_path / "sources.yaml"
    c.write_text(CONFIG_YAML)
    s.write_text(SOURCES_YAML)
    return load_config(str(c), str(s))


def test_bbox_protocol_inheritance(cfg):
    by_name = {s["name"]: s for s in cfg["sources"]}
    # rest inherits the meter bbox
    assert by_name["NVV Skyddad Natur"]["raw"]["bbox"] == [585826, 6550189, 648593, 6611661]
    assert by_name["NVV Skyddad Natur"]["raw"]["bbox_sr"] == 3006
    # ogc inherits CRS84 — never the meter bbox (config.py:105-128)
    assert by_name["SGU Jordarter"]["raw"]["bbox"] == [16.4, 59.0, 17.6, 59.6]
    assert by_name["SGU Jordarter"]["raw"]["bbox_sr"] == 4326
    # explicit bbox wins
    assert by_name["Own bbox"]["raw"]["bbox"] == [1, 2, 3, 4]


def test_source_normalization_defaults(cfg):
    s = cfg["sources"][0]
    assert s["out_name"] == "nvv_skyddad_natur"
    assert s["raw"]["where_clause"] == "1=1"
    assert s["raw"]["out_fields"] == "*"
    assert s["raw"]["page_size"] == 1000


def test_geoprocess_typo_rescue(cfg):
    assert "geoprocessing" in cfg and "geoprocess" not in cfg


def test_enabled_and_cli_filters(cfg):
    assert len(enabled_sources(cfg)) == 3
    assert [s["name"] for s in enabled_sources(cfg, authority="sgu")] == ["SGU Jordarter"]
    assert [s["name"] for s in enabled_sources(cfg, stype="wfs")] == ["Own bbox"]


def test_validation_error(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("workspaces:\n  downloads: /x\n")
    with pytest.raises(ValueError, match="staging"):
        load_config(str(bad))


# --- metrics ---

def test_metrics_rollup(spark):
    rows = [
        ("a", "NVV", "rest", 0.0, 10.0, True, None, None, 100, 1, 5_000_000, 0),
        ("b", "NVV", "rest", 0.0, 40.0, True, None, None, 200, 1, 20_000_000, 1),
        ("c", "SGU", "rest", 0.0, 5.0, False, "HTTPError", "connection refused", 0, 0, 0, 3),
        ("d", "SGU", "ogc", 0.0, 2.0, False, "Timeout", "request timed out", 0, 0, 0, 0),
    ]
    df = spark.createDataFrame(rows, METRICS_SCHEMA)
    got = {r.source_type: r for r in rollup_by_source_type(df).collect()}
    rest = got["rest"]
    assert rest.total == 3 and rest.n_success == 2 and rest.n_failed == 1
    assert abs(rest.success_rate - 2 / 3) < 1e-12
    assert rest.total_features == 300
    assert rest.n_slow == 1 and rest.n_large == 1
    assert rest.error_histogram == {"network": 1}
    assert got["ogc"].error_histogram == {"timeout": 1}


def test_error_classification(spark):
    from pyspark.sql import functions as F

    cases = [
        ("maximum recursion depth exceeded", "recursion"),
        ("request timed out", "timeout"),
        ("connection refused", "network"),
        ("Expecting value: line 1", "parse"),
        ("something odd", "other"),
        (None, None),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "msg string")
    got = [r[0] for r in df.select(classify_error(F.col("msg"))).collect()]
    assert got == [w for _, w in cases]


# --- file discovery ---

def test_discover_files_priority_and_dedup(spark, tmp_path):
    d = tmp_path / "dl"
    (d / "nvv").mkdir(parents=True)
    old = d / "nvv" / "skydd.json"
    old.write_text("{}")
    time.sleep(0.01)
    newer_same_stem = d / "nvv" / "skydd.geojson"
    newer_same_stem.write_text("{}")
    (d / "nvv" / "part_001.geojson").write_text("{}")  # legacy page: skipped
    (d / "nvv" / "other.gpkg").write_text("")
    got = discover_files(spark, str(d)).collect()
    by_stem = {r.stem: r for r in got}
    assert set(by_stem) == {"skydd", "other"}
    # .geojson outranks .json regardless of mtime order
    assert by_stem["skydd"].ext == ".geojson"
