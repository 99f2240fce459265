"""F1-F4 naming functions: Spark expression vs straight-line Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from op_etl_spark.functions.naming import (
    safe_name_expr,
    safe_name_py,
    slug_expr,
    slug_py,
    strip_repeated_authority_expr,
)

CASES = [
    "Naturvårdsverket Skyddade Områden",
    "RAÅ Riksintresse Kulturmiljövård",
    "  spaces   and---dashes  ",
    "ÅÄÖ åäö ß",
    "123 starts with digit",
    "con",
    "UPPER_lower-Mixed.ext",
    "éèüñç special",
    "a" * 100,
    "!!!???",
]


def test_slug_expr_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    got = [r[0] for r in df.select(slug_expr(F.col("s"))).collect()]
    want = [slug_py(c) for c in CASES]
    assert got == want


def test_safe_name_expr_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    got = [r[0] for r in df.select(safe_name_expr(F.col("s"))).collect()]
    want = [safe_name_py(c) for c in CASES]
    assert got == want


def test_slug_rules():
    assert slug_py("Hello World") == "hello_world"
    assert slug_py("åäö ß") == "aao_ss"
    assert slug_py("x" * 100) == "x" * 63
    assert slug_py("__a__b__") == "a_b"


def test_safe_name_rules():
    assert safe_name_py("123abc").startswith("fc_")
    assert safe_name_py("con") == "con_data"


def test_strip_repeated_authority(spark):
    df = spark.createDataFrame(
        [("raa_raa_ri_kultur",), ("raa_x",), ("other",)], "s string"
    )
    got = [r[0] for r in df.select(strip_repeated_authority_expr(F.col("s"), "RAA")).collect()]
    assert got == ["raa_ri_kultur", "raa_x", "other"]
