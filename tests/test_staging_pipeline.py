"""End-to-end staging: GeoJSON/Esri JSON files -> canonical features ->
election -> magnitude validation -> reproject to 3006 -> staged parquet ->
truncate-and-load. The reference's stage+load path (SURVEY.md §3 entry
point 3) on real files."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from op_etl_spark.geometry.ops import clip_to_aoi
from op_etl_spark.geometry.tm import geodetic_to_grid
from op_etl_spark.geometry.wkb import wkb_loads
from op_etl_spark.plans.staging import (
    elect_geometry_type,
    stage_features,
    validate_magnitude,
    write_staged,
)
from op_etl_spark.sinks.load import (
    align_to_template,
    excluded_by_manifest,
    gate_by_manifest,
    truncate_and_load,
)
from op_etl_spark.sources.geojson import read_feature_files


def _write_geojson(path, features, crs_name=None):
    doc = {"type": "FeatureCollection", "features": features}
    if crs_name:
        doc["crs"] = {"type": "name", "properties": {"name": crs_name}}
    with open(path, "w") as f:
        json.dump(doc, f)


def _pt(lon, lat, **props):
    return {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [lon, lat]},
        "properties": props,
    }


@pytest.fixture(scope="module")
def staged_inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("downloads")
    # source A: 18 valid WGS84 points, 2 polygons (minority -> dropped by
    # election), 1 out-of-bounds point (dropped by magnitude validation)
    feats = [_pt(14.0 + i * 0.1, 57.0 + i * 0.05, namn=f"punkt {i}", idx=i) for i in range(18)]
    feats.append(_pt(500.0, 57.0, namn="bad lon", idx=98))
    for j in range(2):
        feats.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[14, 57], [15, 57], [15, 58], [14, 57]]],
                },
                "properties": {"namn": f"poly {j}"},
            }
        )
    _write_geojson(d / "nvv_skydd.geojson", feats)

    # source B: Esri JSON in SWEREF99 TM
    esri = {
        "spatialReference": {"wkid": 3006},
        "features": [
            {"attributes": {"id": i, "aktiv": True},
             "geometry": {"x": 500000.0 + i * 1000, "y": 6500000.0 + i * 1000}}
            for i in range(10)
        ],
    }
    with open(d / "raa_fornminnen.json", "w") as f:
        json.dump(esri, f)
    return d


def test_parse_and_stage(spark, staged_inputs, tmp_path):
    files = [
        {"path": str(staged_inputs / "nvv_skydd.geojson"),
         "source_name": "nvv_skydd", "authority": "NVV"},
        {"path": str(staged_inputs / "raa_fornminnen.json"),
         "source_name": "raa_fornminnen", "authority": "RAA"},
    ]
    raw = read_feature_files(spark, files)
    assert raw.count() == 21 + 10

    # election drops the 2 minority polygons of source A
    elected = elect_geometry_type(raw)
    assert elected.filter(F.col("source_name") == "nvv_skydd").count() == 19

    # magnitude validation drops the lon=500 point (4326 window)
    validated = validate_magnitude(elected)
    assert validated.filter(F.col("source_name") == "nvv_skydd").count() == 18

    staged = stage_features(raw)
    rows = staged.collect()
    assert all(r.crs == 3006 for r in rows)
    assert len(rows) == 18 + 10

    # reprojected coordinates match a direct kernel call
    sample = staged.filter(
        (F.col("source_name") == "nvv_skydd") & (F.col("props.idx") == "0")
    ).first()
    gt, coords = wkb_loads(bytes(sample.geometry))
    ex, ny = geodetic_to_grid(57.0, 14.0, 3006)
    assert gt == "Point"
    assert abs(coords[0] - float(ex)) < 1e-6
    assert abs(coords[1] - float(ny)) < 1e-6
    # bbox recomputed post-reproject
    assert abs(sample.bbox.xmin - float(ex)) < 1e-6

    # staged write partitioned by source
    out = str(tmp_path / "staging")
    write_staged(staged, out)
    back = spark.read.parquet(out)
    assert back.count() == 28
    assert back.filter(F.col("source_name") == "raa_fornminnen").count() == 10


def test_esri_source_untouched_by_reproject(spark, staged_inputs):
    files = [{"path": str(staged_inputs / "raa_fornminnen.json"),
              "source_name": "raa_fornminnen", "authority": "RAA"}]
    staged = stage_features(read_feature_files(spark, files))
    row = staged.orderBy("feature_id").first()
    gt, coords = wkb_loads(bytes(row.geometry))
    assert coords == [500000.0, 6500000.0]  # already 3006: bit-identical


def test_clip_to_aoi(spark, staged_inputs):
    files = [{"path": str(staged_inputs / "raa_fornminnen.json"),
              "source_name": "raa_fornminnen", "authority": "RAA"}]
    staged = stage_features(read_feature_files(spark, files))
    # AOI covering the first 4 points (500000..503000)
    aoi = (499000.0, 6499000.0, 503500.0, 6503500.0)
    clipped = clip_to_aoi(staged, aoi)
    assert clipped.count() == 4
    rows = clipped.collect()
    for r in rows:
        assert aoi[0] <= r.bbox.xmin and r.bbox.xmax <= aoi[2]


def test_truncate_and_load_with_manifest(spark, staged_inputs, tmp_path):
    files = [
        {"path": str(staged_inputs / "nvv_skydd.geojson"),
         "source_name": "nvv_skydd", "authority": "NVV"},
        {"path": str(staged_inputs / "raa_fornminnen.json"),
         "source_name": "raa_fornminnen", "authority": "RAA"},
    ]
    staged = stage_features(read_feature_files(spark, files))
    manifest = spark.createDataFrame([("raa_fornminnen",)], "source_name string")

    gated = gate_by_manifest(staged, manifest)
    assert gated.select("source_name").distinct().count() == 1
    excluded = excluded_by_manifest(staged, manifest)
    assert [r.source_name for r in excluded.select("source_name").distinct().collect()] == ["nvv_skydd"]

    target = str(tmp_path / "sde" / "underlag_raa" / "fornminnen")
    truncate_and_load(gated, target)
    assert spark.read.parquet(target).count() == 10
    # idempotent overwrite (truncate semantics)
    truncate_and_load(gated, target)
    assert spark.read.parquet(target).count() == 10


def test_align_to_template_no_test_semantics(spark):
    src = spark.createDataFrame([(1, "a", 2.5)], "id long, extra string, v double")
    tmpl = spark.createDataFrame([], "id int, v double, missing string")
    aligned = align_to_template(src, tmpl)
    assert [f.name for f in aligned.schema.fields] == ["id", "v", "missing"]
    row = aligned.first()
    assert row.id == 1 and row.v == 2.5 and row.missing is None


def test_schema_evolution_merge_and_align(spark, tmp_path):
    """A staging dir whose later runs add a column: mergeSchema surfaces
    the union schema (older files null-fill), and align_to_template
    projects any run's frame back onto the original target contract —
    the NO_TEST load path under schema drift."""
    staged = str(tmp_path / "staged")
    v1 = spark.range(5).select(F.col("id"), F.lit("a").alias("name"))
    v1.write.parquet(staged + "/run=1")
    v2 = spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("name"), F.lit(9.5).alias("score")
    )
    v2.write.parquet(staged + "/run=2")

    merged = spark.read.option("mergeSchema", "true").parquet(staged)
    assert set(merged.columns) == {"id", "name", "score", "run"}
    assert merged.count() == 8
    # old rows null-fill the new column
    assert merged.filter("run = 1 AND score IS NULL").count() == 5

    # loading back into the v1 contract drops the drifted column
    aligned = align_to_template(merged, v1)
    assert aligned.columns == v1.columns
    assert aligned.count() == 8

    # widening the contract null-fills missing columns, matched by NAME
    template_v3 = v2.limit(0).withColumn("extra", F.lit(None).cast("string"))
    widened = align_to_template(merged, template_v3)
    assert widened.columns == ["id", "name", "score", "extra"]
    assert widened.filter("extra IS NOT NULL").count() == 0
