"""Config-driven logging parity (reference etl/logging_config.py:11-85)."""

from __future__ import annotations

import json
import logging

import yaml

from op_etl_spark.config.logging_setup import setup_logging


def _reset_root():
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
        h.close()


class TestSetupLogging:
    def teardown_method(self):
        _reset_root()
        logging.getLogger().setLevel(logging.WARNING)

    def test_summary_and_debug_files_honor_levels(self, tmp_path):
        summary = tmp_path / "logs" / "etl.log"
        debug = tmp_path / "logs" / "etl.debug.log"
        setup_logging(
            {
                "level": "WARNING",
                "summary_file": str(summary),
                "debug_file": str(debug),
            }
        )
        log = logging.getLogger("op_etl_spark.test")
        log.debug("debug-line")
        log.warning("warning-line")
        for h in logging.getLogger().handlers:
            h.flush()
        assert "debug-line" not in summary.read_text()
        assert "warning-line" in summary.read_text()
        assert "debug-line" in debug.read_text()

    def test_idempotent_no_duplicate_handlers(self, tmp_path):
        cfg = {"summary_file": str(tmp_path / "a.log")}
        setup_logging(cfg)
        setup_logging(cfg)
        root = logging.getLogger()
        assert len(root.handlers) == 2  # console + one file, not doubled

    def test_none_config_console_only(self):
        setup_logging(None)
        root = logging.getLogger()
        assert len(root.handlers) == 1
        assert root.level == logging.INFO

    def test_cli_honors_logging_section(self, tmp_path, capsys):
        """End-to-end: a config.yaml `logging:` section produces the file
        the reference operator expects (run.py:259-260 parity)."""
        from op_etl_spark import run as run_mod

        data = tmp_path / "f.geojson"
        data.write_text(
            json.dumps(
                {
                    "type": "FeatureCollection",
                    "crs": {"type": "name", "properties": {"name": "EPSG:3006"}},
                    "features": [
                        {
                            "type": "Feature",
                            "geometry": {
                                "type": "Point",
                                "coordinates": [610000.0, 6580000.0],
                            },
                            "properties": {"n": 1},
                        }
                    ],
                }
            )
        )
        logf = tmp_path / "logs" / "run.log"
        cfg = {
            "workspaces": {
                "downloads": str(tmp_path / "dl"),
                "staging": str(tmp_path / "staging"),
            },
            "logging": {"level": "INFO", "summary_file": str(logf)},
            "sources": [
                {
                    "name": "f",
                    "authority": "T",
                    "type": "file",
                    "enabled": True,
                    "raw": {"paths": [str(data)]},
                }
            ],
        }
        cfg_path = tmp_path / "c.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        rc = run_mod.main(
            ["--config", str(cfg_path), "--workspace", str(tmp_path / "ws")]
        )
        assert rc == 0
        assert logf.exists()
