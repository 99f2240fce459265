"""GeoPackage reader via stdlib sqlite3 (reference S13:
etl/stage_files.py:347-401 `import_gpkg` — layer walk, first importable
layer wins).

GeoPackage is SQLite + the `gpkg_*` registry tables (OGC GeoPackage
Encoding Standard). The geometry BLOB is a 'GP' header (flags byte:
bit 0 endianness of the envelope, bits 1-3 envelope indicator) followed
by standard WKB — which feeds straight into the engine's codec.
"""

from __future__ import annotations

import sqlite3
import struct

from op_etl_spark.geometry.wkb import wkb_loads

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def parse_gpkg_geometry(blob: bytes):
    """GeoPackage geometry BLOB -> (geom_type, coordinates, srs_id)."""
    if blob is None or len(blob) < 8 or blob[:2] != b"GP":
        return None, None, None
    flags = blob[3]
    little = flags & 0x01
    env_ind = (flags >> 1) & 0x07
    empty = (flags >> 4) & 0x01
    srs_id = struct.unpack_from("<i" if little else ">i", blob, 4)[0]
    if empty:
        return None, None, srs_id
    off = 8 + _ENVELOPE_DOUBLES.get(env_ind, 0) * 8
    gt, coords = wkb_loads(blob[off:])
    return gt, coords, srs_id


def list_feature_tables(path: str) -> list[dict]:
    """gpkg_contents feature layers with geometry column + SRS."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            """SELECT c.table_name, g.column_name, g.srs_id
               FROM gpkg_contents c
               JOIN gpkg_geometry_columns g ON g.table_name = c.table_name
               WHERE c.data_type = 'features'"""
        ).fetchall()
        return [
            {"table": t, "geom_col": g, "srs_id": s} for t, g, s in rows
        ]
    finally:
        con.close()


def read_gpkg(path: str, table: str | None = None):
    """Yield (geom_type, coords, props, epsg) from the first (or named)
    feature table."""
    tables = list_feature_tables(path)
    if not tables:
        return
    if table is None:
        chosen = tables[0]
    else:
        chosen = next((t for t in tables if t["table"] == table), None)
        if chosen is None:
            # a named layer that doesn't exist is an error, not a silent
            # read of whichever table happens to be first
            raise KeyError(
                f"layer {table!r} not in {path}: {[t['table'] for t in tables]}"
            )
    con = sqlite3.connect(path)
    con.row_factory = sqlite3.Row
    try:
        for row in con.execute(f'SELECT * FROM "{chosen["table"]}"'):
            d = dict(row)
            blob = d.pop(chosen["geom_col"], None)
            gt, coords, srs = parse_gpkg_geometry(blob)
            if gt is None:
                continue
            epsg = srs if srs and srs > 0 else chosen["srs_id"]
            props = {k: v for k, v in d.items() if v is not None}
            yield gt, coords, props, int(epsg)
    finally:
        con.close()
