"""Shapefile / GeoPackage / ZIP readers (S13/S3) on files we synthesize
byte-by-byte (shapefile) and via sqlite3 (gpkg)."""

from __future__ import annotations

import os
import sqlite3
import struct
import zipfile

import pytest

from op_etl_spark.geometry.wkb import wkb_dumps
from op_etl_spark.sources.gpkg import list_feature_tables, parse_gpkg_geometry, read_gpkg
from op_etl_spark.sources.shapefile import detect_prj_epsg, read_dbf, read_shapefile, read_shp


def write_point_shapefile(base_path: str, points, fields=None):
    """Minimal valid .shp + .dbf + .prj writer (test fixture)."""
    records = []
    for i, (x, y) in enumerate(points):
        content = struct.pack("<i2d", 1, x, y)
        records.append(struct.pack(">2i", i + 1, len(content) // 2) + content)
    body = b"".join(records)
    file_len_words = (100 + len(body)) // 2
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    header = struct.pack(
        ">i5ii", 9994, 0, 0, 0, 0, 0, file_len_words
    ) + struct.pack("<2i", 1000, 1) + struct.pack(
        "<4d", min(xs), min(ys), max(xs), max(ys)
    ) + struct.pack("<4d", 0, 0, 0, 0)
    with open(base_path + ".shp", "wb") as f:
        f.write(header + body)

    fields = fields or [("NAMN", [f"pt {i}" for i in range(len(points))])]
    n = len(points)
    field_descs = b""
    for name, _vals in fields:
        field_descs += name.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([20]) + b"\x00" * 15
    header_size = 32 + len(field_descs) + 1
    record_size = 1 + 20 * len(fields)
    dbf_header = struct.pack(
        "<B3Bihh20x", 3, 24, 1, 1, n, header_size, record_size
    )
    recs = b""
    for i in range(n):
        recs += b" "
        for _name, vals in fields:
            recs += str(vals[i]).encode().ljust(20)[:20]
    with open(base_path + ".dbf", "wb") as f:
        f.write(dbf_header + field_descs + b"\x0d" + recs + b"\x1a")

    with open(base_path + ".prj", "w") as f:
        f.write('PROJCS["SWEREF99_TM",GEOGCS["GCS_SWEREF99"],AUTHORITY["EPSG","3006"]]')


def test_shapefile_roundtrip(tmp_path):
    pts = [(500000.0 + i * 100, 6500000.0 + i * 100) for i in range(5)]
    base = str(tmp_path / "test_pts")
    write_point_shapefile(base, pts)

    shapes = list(read_shp(base + ".shp"))
    assert [s[0] for s in shapes] == ["Point"] * 5
    assert shapes[2][1] == [500200.0, 6500200.0]

    attrs = list(read_dbf(base + ".dbf"))
    assert attrs[0]["NAMN"] == "pt 0"

    assert detect_prj_epsg(base + ".shp") == 3006

    full = list(read_shapefile(base + ".shp"))
    assert len(full) == 5
    assert full[1][2]["NAMN"] == "pt 1"
    assert full[1][3] == 3006


def test_prj_fallback(tmp_path):
    base = str(tmp_path / "noprj")
    write_point_shapefile(base, [(1.0, 2.0)])
    os.remove(base + ".prj")
    assert detect_prj_epsg(base + ".shp") == 3006  # assume-3006 default
    with open(base + ".prj", "w") as f:
        f.write('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984"]]')
    assert detect_prj_epsg(base + ".shp") == 4326


def write_gpkg(path: str, table="lager", srs=3006, n=4):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    con.execute(
        "CREATE TABLE gpkg_geometry_columns "
        "(table_name TEXT, column_name TEXT, srs_id INT)"
    )
    con.execute(f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY, geom BLOB, namn TEXT)')
    con.execute("INSERT INTO gpkg_contents VALUES (?, 'features')", (table,))
    con.execute("INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?)", (table, srs))
    for i in range(n):
        wkb = wkb_dumps("Point", [500000.0 + i, 6500000.0 + i])
        blob = b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs) + wkb
        con.execute(f'INSERT INTO "{table}" VALUES (?, ?, ?)', (i, blob, f"p{i}"))
    con.commit()
    con.close()


def test_gpkg_reader(tmp_path):
    p = str(tmp_path / "data.gpkg")
    write_gpkg(p)
    assert list_feature_tables(p) == [{"table": "lager", "geom_col": "geom", "srs_id": 3006}]
    rows = list(read_gpkg(p))
    assert len(rows) == 4
    gt, coords, props, epsg = rows[2]
    assert gt == "Point" and coords == [500002.0, 6500002.0]
    assert props["namn"] == "p2" and epsg == 3006


def test_gpkg_geometry_blob_with_envelope():
    wkb = wkb_dumps("Point", [1.0, 2.0])
    # flags: little-endian + envelope indicator 1 (xy envelope, 4 doubles)
    blob = b"GP" + bytes([0, 0x03]) + struct.pack("<i", 3006) + struct.pack("<4d", 1, 1, 2, 2) + wkb
    gt, coords, srs = parse_gpkg_geometry(blob)
    assert gt == "Point" and coords == [1.0, 2.0] and srs == 3006


def test_zip_candidate_priority(spark, tmp_path):
    """ZIP with both .shp and .geojson: gpkg>shp>geojson priority means the
    shapefile wins."""
    import json

    base = str(tmp_path / "inner")
    write_point_shapefile(base, [(500000.0, 6500000.0), (500100.0, 6500100.0)])
    gj = tmp_path / "inner.geojson"
    gj.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{"type": "Feature",
                      "geometry": {"type": "Point", "coordinates": [15.0, 59.0]},
                      "properties": {}}] * 7,
    }))
    zpath = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for ext in (".shp", ".dbf", ".prj"):
            z.write(base + ext, "inner" + ext)
        z.write(gj, "inner.geojson")

    from op_etl_spark.sources.geojson import read_feature_files

    df = read_feature_files(
        spark, [{"path": str(zpath), "source_name": "zipped", "authority": "MSB"}]
    )
    rows = df.collect()
    assert len(rows) == 2  # shapefile (2 points) won over geojson (7)
    assert rows[0].crs == 3006
