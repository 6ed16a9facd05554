"""Shuffle-volume readout for the scale probes.

Reads cumulative shuffle write/read bytes from the Spark UI REST API
(the probe sessions enable the UI on an ephemeral port); per-op deltas
come from snapshotting before/after an action.  Local-mode only — on a
real cluster you'd read the same numbers from the history server.
"""

from __future__ import annotations

import json
import urllib.request

#: extra session conf the probes pass to build_session
UI_EXTRA = {"spark.ui.enabled": "true", "spark.ui.port": "4049"}


def shuffle_totals(spark) -> tuple[int, int]:
    """Cumulative (shuffle_write_bytes, shuffle_read_bytes) across all
    completed stages of this application."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return (0, 0)
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return (w, rd)


class ShuffleMeter:
    """meter = ShuffleMeter(spark); ...action...; w, r = meter.delta()"""

    def __init__(self, spark) -> None:
        self.spark = spark
        self._last = shuffle_totals(spark)

    def delta(self) -> tuple[int, int]:
        now = shuffle_totals(self.spark)
        d = (now[0] - self._last[0], now[1] - self._last[1])
        self._last = now
        return d


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024 or unit == "TB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n} TB"
