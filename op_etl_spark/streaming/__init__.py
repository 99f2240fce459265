"""Structured Streaming surface.

The reference is a scheduled batch pipeline with idempotent
truncate-and-load refresh (etl/load_sde.py:99-112, config.yaml:18-20) and
no streaming operators (SURVEY.md §2.12). This package is the natural
continuous-ingest extension of that model, built on public Structured
Streaming primitives:

 - `ingest`   : file-source stream over a downloads directory -> canonical
                feature rows -> append staging sink; foreachBatch
                truncate-and-load (the streaming twin of the reference's
                full-refresh loader).
 - `windows`  : watermarked tumbling / sliding / session-window event
                aggregations (late-data tolerant).
 - `stateful` : applyInPandasWithState gap-based sessionizer — custom
                stateful logic Spark's built-in windows can't express.

Every transformation here also runs in batch mode (same DataFrame code) —
tests assert stream results equal the batch equivalents on identical data.
"""

from . import dedup, ingest, stateful, windows  # noqa: F401
