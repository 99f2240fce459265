"""Spark-facing geometry operators (Arrow pandas UDFs over the WKB kernel).

Design for scale: geometry bytes never leave the executor; each UDF
processes an Arrow batch, and reprojection gathers EVERY coordinate in the
batch into one flat numpy array, transforms once (vectorized Krüger
series), and scatters back — the Python-per-row cost is only WKB
decode/encode, the math is C-speed. Clip runs only after the cheap
envelope prefilter (functions/bbox.py) has discarded non-straddling rows
JVM-side.

Reference parity: T1 Project (etl/process.py:129-156), T2 DefineProjection
(metadata-only, etl/stage_files.py:627-643 — here just setting the crs
column), T3 Clip (etl/process.py:107-123).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .clip import clip_geometry_bbox
from .tm import reproject_xy
from .wkb import envelope as _envelope
from .wkb import wkb_dumps, wkb_loads

BBOX_SCHEMA = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)

CLIPPED_SCHEMA = T.StructType(
    [
        T.StructField("geom_type", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)


@F.pandas_udf(BBOX_SCHEMA)
def envelope_wkb(geom: pd.Series) -> pd.DataFrame:
    """WKB -> envelope struct (vectorized per Arrow batch)."""
    rows = []
    for buf in geom:
        if buf is None:
            rows.append((None, None, None, None))
            continue
        gt, coords = wkb_loads(bytes(buf))
        rows.append(_envelope(gt, coords))
    return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])


def make_reproject_udf(dst_epsg: int):
    """Reproject UDF factory: (wkb, src_epsg) -> wkb in dst_epsg.

    Batch-vectorized: all coordinates of all geometries sharing a source
    CRS are transformed in one numpy call.
    """

    @F.pandas_udf(T.BinaryType())
    def _reproject(geom: pd.Series, src_epsg: pd.Series) -> pd.Series:
        import numpy as np

        decoded = []
        for buf, src in zip(geom, src_epsg):
            if buf is None or src is None:
                decoded.append(None)
            else:
                gt, coords = wkb_loads(bytes(buf))
                decoded.append((gt, coords, int(src)))

        # gather: flat coordinate arrays per source CRS
        by_src: dict[int, list] = {}
        for i, d in enumerate(decoded):
            if d is None:
                continue
            gt, coords, src = d
            flat: list = []

            def walk(c, acc):
                if isinstance(c[0], (int, float)):
                    acc.append((float(c[0]), float(c[1])))
                else:
                    for sub in c:
                        walk(sub, acc)

            walk(coords, flat)
            by_src.setdefault(src, []).append((i, flat))

        transformed: dict[int, list] = {}
        for src, items in by_src.items():
            xs = np.array([p[0] for _, flat in items for p in flat])
            ys = np.array([p[1] for _, flat in items for p in flat])
            tx, ty = reproject_xy(xs, ys, src, dst_epsg)
            off = 0
            for i, flat in items:
                n = len(flat)
                transformed[i] = list(zip(tx[off : off + n], ty[off : off + n]))
                off += n

        out = []
        for i, d in enumerate(decoded):
            if d is None:
                out.append(None)
                continue
            gt, coords, _src = d
            pts = iter(transformed[i])

            def rebuild(c):
                if isinstance(c[0], (int, float)):
                    x, y = next(pts)
                    return [float(x), float(y)]
                return [rebuild(sub) for sub in c]

            out.append(wkb_dumps(gt, rebuild(coords)))
        return pd.Series(out)

    return _reproject


def make_clip_udf(bbox: tuple[float, float, float, float]):
    """Exact clip-to-rectangle UDF factory: (geom_type, wkb) -> clipped
    struct (nulls when the geometry falls entirely outside)."""

    @F.pandas_udf(CLIPPED_SCHEMA)
    def _clip(geom_type: pd.Series, geom: pd.Series) -> pd.DataFrame:
        types, bufs = [], []
        for gt, buf in zip(geom_type, geom):
            if buf is None:
                types.append(None)
                bufs.append(None)
                continue
            _gt, coords = wkb_loads(bytes(buf))
            new_gt, new_coords = clip_geometry_bbox(_gt, coords, bbox)
            if new_gt is None:
                types.append(None)
                bufs.append(None)
            else:
                types.append(new_gt)
                bufs.append(wkb_dumps(new_gt, new_coords))
        return pd.DataFrame({"geom_type": types, "geometry": bufs})

    return _clip


# --- DataFrame-level operators (envelope prefilter + exact kernel) ---

def reproject(df: DataFrame, dst_epsg: int, geom_col: str = "geometry",
              crs_col: str = "crs", assume_epsg: int | None = None) -> DataFrame:
    """Project every geometry to dst_epsg; updates geometry, bbox and crs
    columns. Rows already in dst_epsg pass through untouched (JVM-side
    short-circuit — the UDF only sees rows needing work).

    Null-CRS rows: `assume_epsg` names the CRS they are assumed to be in
    (the reference's DefineProjection-then-Project chain, T2+T1). The
    default None assumes they are already in dst_epsg — metadata-only
    stamping, NO coordinate transform — which is only sound after
    `define_projection` has run (as in plans/staging.stage_features)."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(df.sparkSession)
    udf = make_reproject_udf(dst_epsg)
    crs_in = F.coalesce(F.col(crs_col), F.lit(assume_epsg or dst_epsg))
    needs = crs_in != dst_epsg
    out = df.withColumn(
        geom_col,
        F.when(needs, udf(F.col(geom_col), crs_in)).otherwise(F.col(geom_col)),
    ).withColumn(crs_col, F.lit(dst_epsg))
    if "bbox" in df.columns:
        out = out.withColumn("bbox", envelope_wkb(F.col(geom_col)))
    return out


def define_projection(df: DataFrame, epsg: int, crs_col: str = "crs") -> DataFrame:
    """Metadata-only SR assignment for rows with unknown CRS (T2)."""
    return df.withColumn(
        crs_col, F.coalesce(F.col(crs_col), F.lit(epsg)).cast("int")
    )


def clip_to_aoi(df: DataFrame, bbox: tuple[float, float, float, float],
                geom_col: str = "geometry") -> DataFrame:
    """Clip features to an AOI rectangle (T3).

    Plan shape: (1) envelope prefilter drops disjoint rows at scan speed;
    (2) fully-inside rows bypass the UDF entirely; (3) only straddlers pay
    the exact-clip cost. At 100 TB the UDF typically sees <1% of rows.
    """
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(df.sparkSession)
    xmin, ymin, xmax, ymax = bbox
    b = F.col("bbox")
    intersects = (
        (b["xmax"] >= xmin) & (b["xmin"] <= xmax)
        & (b["ymax"] >= ymin) & (b["ymin"] <= ymax)
    )
    inside = (
        (b["xmin"] >= xmin) & (b["xmax"] <= xmax)
        & (b["ymin"] >= ymin) & (b["ymax"] <= ymax)
    )
    udf = make_clip_udf(bbox)
    pre = df.filter(intersects)
    clipped = pre.withColumn(
        "_clip",
        F.when(inside, F.struct(F.col("geom_type").alias("geom_type"),
                                F.col(geom_col).alias("geometry"))).otherwise(
            udf(F.col("geom_type"), F.col(geom_col))
        ),
    )
    return (
        clipped.filter(F.col("_clip.geometry").isNotNull())
        .withColumn("geom_type", F.col("_clip.geom_type"))
        .withColumn(geom_col, F.col("_clip.geometry"))
        .drop("_clip")
        .withColumn("bbox", envelope_wkb(F.col(geom_col)))
    )
