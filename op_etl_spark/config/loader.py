"""Config loader: YAML global config + source specs -> normalized plan
inputs (reference etl/config.py:21-173 semantics).

Preserved behaviors, each cited:
 - merge of config.yaml + sources.yaml (config.py:21-45);
 - `out_name` slug derivation from the source name (config.py:58-63 via
   download_http slug);
 - bbox inheritance with protocol defaulting (config.py:105-128): a
   source without its own bbox inherits the global bbox *appropriate to
   its protocol* — meter-based 3006 bbox for REST/WFS, CRS84 lon/lat for
   OGC — never leaking meters into a CRS84 request;
 - `geoprocess`/`geoprocessing` key merge + typo rescue (config.py:47-56);
 - required-keys validation (config.py:79-101);
 - normalized source shape (config.py:131-173 `normalize_sources` — dead
   code in the reference but documenting the intended schema; FIXTURES.md
   F2 mirrors it).
"""

from __future__ import annotations


from op_etl_spark.functions.naming import slug_py

REQUIRED_WORKSPACE_KEYS = ("downloads", "staging")

# protocol -> which global bbox flavor it inherits
_PROTOCOL_BBOX = {
    "rest": "bbox_3006",
    "wfs": "bbox_3006",
    "ogc": "bbox_crs84",
    "atom": "bbox_3006",
    "file": None,
    "http": None,
}

RAW_DEFAULTS = {
    "where_clause": "1=1",       # config.py:154
    "out_fields": "*",           # config.py:155
    "page_size": 1000,           # config.py:165
    "response_format": "json",
    "supports_epsg_3006": False,
}


def _merge(base: dict, extra: dict) -> dict:
    out = dict(base)
    for k, v in (extra or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def validate_config(cfg: dict) -> None:
    ws = cfg.get("workspaces") or {}
    missing = [k for k in REQUIRED_WORKSPACE_KEYS if k not in ws]
    if missing:
        raise ValueError(f"config missing workspaces keys: {missing}")


def normalize_source(src: dict, global_cfg: dict) -> dict:
    """One raw YAML source block -> normalized spec with inherited bbox,
    defaults and out_name slug."""
    stype = (src.get("type") or "file").lower()
    raw = dict(RAW_DEFAULTS)
    raw.update(src.get("raw") or {})

    if not raw.get("bbox"):
        flavor = _PROTOCOL_BBOX.get(stype)
        if flavor:
            inherited = (global_cfg.get("global_bbox") or {}).get(flavor)
            if inherited:
                raw["bbox"] = list(inherited)
                raw["bbox_sr"] = 3006 if flavor == "bbox_3006" else 4326

    return {
        "name": src["name"],
        "out_name": slug_py(src["name"]),
        "authority": src.get("authority", ""),
        "type": stype,
        "url": src.get("url"),
        "enabled": bool(src.get("enabled", True)),
        "raw": raw,
    }


def load_config(config_path: str, sources_path: str | None = None) -> dict:
    """Read + merge config and source YAML files, normalize every source."""
    import yaml

    with open(config_path) as f:
        cfg = yaml.safe_load(f) or {}
    if sources_path:
        with open(sources_path) as f:
            sources_doc = yaml.safe_load(f) or {}
        cfg = _merge(cfg, {"sources": sources_doc.get("sources", sources_doc)})

    # geoprocess/geoprocessing typo rescue (config.py:47-56)
    if "geoprocess" in cfg and "geoprocessing" not in cfg:
        cfg["geoprocessing"] = cfg.pop("geoprocess")
    elif "geoprocess" in cfg:
        cfg["geoprocessing"] = _merge(cfg["geoprocessing"], cfg.pop("geoprocess"))

    validate_config(cfg)
    cfg["sources"] = [
        normalize_source(s, cfg) for s in (cfg.get("sources") or [])
    ]
    return cfg


def enabled_sources(cfg: dict, authority: str | None = None,
                    stype: str | None = None) -> list[dict]:
    """P7 source filters: enabled + optional --authority/--type CLI
    filters (run.py:189-193)."""
    out = []
    for s in cfg["sources"]:
        if not s["enabled"]:
            continue
        if authority and s["authority"].lower() != authority.lower():
            continue
        if stype and s["type"] != stype.lower():
            continue
        out.append(s)
    return out
