"""Name-normalization functions.

Re-expresses the reference's naming helpers as Spark column expressions
(reference: etl/download_http.py:21-38 `slug`, etl/utils.py:56-113
`make_arcpy_safe_name`, etl/download_rest.py:32-40 `sanitize_layer_name`,
etl/stage_files.py:297-314 `create_safe_name`). Pure `F.*` chains —
codegen'd, no UDF — so they run at scan speed on 100 TB of rows.

`slug_py` is the straight-line Python twin used by unit tests as an oracle.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1:1 transliteration handled by translate(); multi-char (ß→ss) handled first.
_TRANSLATE_SRC = "åäöéèüæøñç"
_TRANSLATE_DST = "aaoeeuaonc"

RESERVED = ("con", "prn", "aux", "nul", "lpt1", "com1")


def slug_expr(col: Column, maxlen: int = 63) -> Column:
    """Slug: lowercase, transliterate, whitespace→_, strip non [a-z0-9_-],
    collapse repeated _, trim leading/trailing _, cap length.

    Mirrors download_http.py:21-38 semantics.
    """
    s = F.lower(col)
    s = F.regexp_replace(s, "ß", "ss")
    s = F.translate(s, _TRANSLATE_SRC, _TRANSLATE_DST)
    s = F.regexp_replace(s, "\\s+", "_")
    s = F.regexp_replace(s, "[^a-z0-9_-]", "")
    s = F.regexp_replace(s, "_+", "_")
    s = F.regexp_replace(s, "^_|_$", "")
    return F.substring(s, 1, maxlen)


def slug_py(s: str, maxlen: int = 63) -> str:
    """Python oracle for slug_expr (same rules, straight-line)."""
    s = s.lower().replace("ß", "ss")
    s = s.translate(str.maketrans(_TRANSLATE_SRC, _TRANSLATE_DST))
    s = re.sub(r"\s+", "_", s)
    s = re.sub(r"[^a-z0-9_-]", "", s)
    s = re.sub(r"_+", "_", s)
    s = re.sub(r"^_|_$", "", s)
    return s[:maxlen]


def safe_name_expr(col: Column, max_length: int = 100) -> Column:
    """Database-safe identifier: slug rules + must start with a letter
    (prefix `fc_` otherwise) + reserved-word suffix `_data`.

    Mirrors utils.py:56-113 (NFD fold approximated by the transliteration
    table — the closed Swedish-data character set the reference handles).
    """
    s = slug_expr(col, max_length)
    s = F.when(s.rlike("^[0-9]"), F.concat(F.lit("fc_"), s)).otherwise(s)
    s = F.when(s.isin(*RESERVED), F.concat(s, F.lit("_data"))).otherwise(s)
    return F.substring(s, 1, max_length)


def safe_name_py(s: str, max_length: int = 100) -> str:
    s = unicodedata.normalize("NFC", s)
    s = slug_py(s, max_length)
    if re.match(r"^[0-9]", s):
        s = "fc_" + s
    if s in RESERVED:
        s = s + "_data"
    return s[:max_length]


def sanitize_layer_name_expr(col: Column, maxlen: int = 200) -> Column:
    """Filesystem-safe layer name: strip <>:"/\\|?* and control chars,
    whitespace→_, cap at 200 (mirrors download_rest.py:32-40)."""
    s = F.regexp_replace(col, "[<>:\"/\\\\|?*\\x00-\\x1f]", "")
    s = F.regexp_replace(s, "\\s+", "_")
    return F.substring(s, 1, maxlen)


def strip_repeated_authority_expr(col: Column, authority: str) -> Column:
    """`raa_raa_x` → `raa_x` (mirrors stage_files.py:297-314)."""
    a = authority.lower()
    return F.regexp_replace(col, f"^({re.escape(a)}_)+", f"{a}_")
