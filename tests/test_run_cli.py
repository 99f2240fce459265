"""End-to-end CLI driver: YAML config -> full pipeline -> loaded tables +
metrics, via the same entry point a reference user would run."""

from __future__ import annotations

import json

import yaml

from op_etl_spark import run as run_mod

GEOJSON = {
    "type": "FeatureCollection",
    "crs": {"type": "name", "properties": {"name": "EPSG:3006"}},
    "features": [
        {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [610000.0, 6580000.0]},
            "properties": {"name": "inside-aoi"},
        },
        {
            # magnitude-valid SWEREF99 TM coords (survives staging P9)
            # but outside the AOI bbox (dropped by the clip stage T3)
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [300000.0, 6700000.0]},
            "properties": {"name": "outside-aoi"},
        },
    ],
}


def test_cli_runs_full_pipeline(spark, tmp_path, capsys):
    data = tmp_path / "roads.geojson"
    data.write_text(json.dumps(GEOJSON))

    cfg = {
        "workspaces": {
            "downloads": str(tmp_path / "downloads"),
            "staging": str(tmp_path / "staging"),
        },
        # reference AOI bbox (config.yaml:135); clips the second feature out
        "geoprocessing": {"aoi_bbox": [585826.0, 6550189.0, 648593.0, 6611661.0]},
        "sources": [
            {
                "name": "roads",
                "authority": "TEST",
                "type": "file",
                "enabled": True,
                "raw": {"paths": [str(data)]},
            },
            {
                "name": "broken",
                "authority": "TEST",
                "type": "rest",
                "url": "http://nonexistent.invalid/FeatureServer",
                "enabled": False,  # P7: disabled sources are skipped
            },
        ],
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    ws = str(tmp_path / "ws")

    rc = run_mod.main(["--config", str(cfg_path), "--workspace", ws])
    assert rc == 0

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sources_ok"] == 1 and out["sources_failed"] == 0

    # staged both features; AOI clip dropped the outside point before load
    staged = spark.read.parquet(out["stages"]["staging"])
    assert staged.count() == 2
    loaded_path = out["stages"]["loaded"]["roads"]
    loaded = spark.read.parquet(loaded_path)
    rows = loaded.collect()
    assert len(rows) == 1
    assert rows[0].props["name"] == "inside-aoi"
    # authority routing into the Underlag_{AUTHORITY} namespace (K4)
    assert "underlag_test" in loaded_path

    metrics = spark.read.json(out["stages"]["metrics"])
    assert metrics.filter("success = true").count() == 1


def test_wfs_connector_discovers_typenames_when_unconfigured(spark, monkeypatch):
    """An atom-dispatched (or minimally configured) WFS source has no
    typenames; the CLI connector must discover them via GetCapabilities."""
    CAPS = """<?xml version="1.0"?>
    <WFS_Capabilities xmlns="http://www.opengis.net/wfs/2.0">
      <FeatureTypeList>
        <FeatureType><Name>ns:roads</Name></FeatureType>
      </FeatureTypeList>
    </WFS_Capabilities>"""
    FEATURES = json.dumps({
        "type": "FeatureCollection",
        "crs": {"type": "name", "properties": {"name": "EPSG:3006"}},
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [400000.0, 6500000.0]},
             "properties": {"n": 1}},
        ],
    })

    def text_fetcher(url, params):
        if params.get("request") == "GetCapabilities":
            return CAPS
        assert params.get("typeNames") or params.get("typename") or "roads" in str(params)
        return FEATURES

    import op_etl_spark.sources.fetchers as fetchers

    monkeypatch.setattr(fetchers, "default_text_fetcher", text_fetcher)
    from op_etl_spark.run import default_connectors

    conn = default_connectors()["wfs"]
    src = {"name": "w", "authority": "A", "url": "http://mock/wfs",
           "raw": {"bbox": None}}
    rows = conn(spark, src).collect()
    assert len(rows) == 1 and rows[0].geom_type == "Point"


def _step_cfg(tmp_path):
    data = tmp_path / "roads.geojson"
    data.write_text(json.dumps(GEOJSON))
    cfg = {
        "workspaces": {
            "downloads": str(tmp_path / "downloads"),
            "staging": str(tmp_path / "staging"),
        },
        "geoprocessing": {"aoi_bbox": [585826.0, 6550189.0, 648593.0, 6611661.0]},
        "sources": [
            {
                "name": "roads",
                "authority": "TEST",
                "type": "file",
                "enabled": True,
                "raw": {"paths": [str(data)]},
            },
        ],
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return str(cfg_path)


def test_cli_per_step_execution(spark, tmp_path, capsys):
    """The reference runs --download/--process/--load_sde as independently
    selectable steps (reference run.py:240-248, 289). Stage a workspace
    with download+process, then run load ALONE against it — the operator
    re-running just the load after an SDE outage."""
    cfg_path = _step_cfg(tmp_path)
    ws = str(tmp_path / "ws")

    rc = run_mod.main(
        ["--config", cfg_path, "--workspace", ws, "--download", "--process"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stages"]["steps"] == ["download", "process"]
    assert "loaded" not in out["stages"]  # load did NOT run
    assert spark.read.parquet(out["stages"]["processed"]).count() == 1

    metrics_before = spark.read.json(out["stages"]["metrics"]).collect()
    assert len(metrics_before) == 1  # download step recorded its source

    rc = run_mod.main(["--config", cfg_path, "--workspace", ws, "--load"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stages"]["steps"] == ["load"]
    loaded = spark.read.parquet(out["stages"]["loaded"]["roads"])
    rows = loaded.collect()
    assert len(rows) == 1 and rows[0].props["name"] == "inside-aoi"

    # a load-only run must NOT clobber the download run's metrics table
    # with an empty one (round-4 advice, plans/pipeline.py)
    metrics_after = spark.read.json(out["stages"]["metrics"]).collect()
    assert metrics_after == metrics_before


def test_cli_load_without_staged_workspace_fails_clearly(tmp_path):
    cfg_path = _step_cfg(tmp_path)
    import pytest

    with pytest.raises(FileNotFoundError, match="run the producing step first"):
        run_mod.main(
            ["--config", cfg_path, "--workspace", str(tmp_path / "empty_ws"), "--load"]
        )


def test_cli_continue_on_failure_exit_code(spark, tmp_path, capsys):
    cfg = {
        "workspaces": {
            "downloads": str(tmp_path / "dl"),
            "staging": str(tmp_path / "st"),
        },
        "sources": [
            {
                "name": "broken",
                "authority": "X",
                "type": "nosuchproto",
                "enabled": True,
            },
        ],
    }
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = run_mod.main(["--config", str(cfg_path), "--workspace", str(tmp_path / "ws")])
    assert rc == 1  # run completed (continue-on-failure) but flagged
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sources_failed"] == 1
