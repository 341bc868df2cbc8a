"""Pure-Python reference model of whisper semantics (dict-based, no ring).

Serves as the oracle for property-based engine tests (SURVEY.md §5.2-3):
implements update/update_many/fetch with the same pinned semantics —
LWW per (metric, interval), xff-gated cascade, from-age archive routing,
``+spp`` start-exclusive fetch bounds, None for unknown slots.

This is a semantics model, NOT a port: no byte layout, no ring
addressing — those are storage concerns the Spark engine replaces.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from go_whisper_spark.model import AggregationMethod, SeriesConfig


class PyWhisper:
    def __init__(self, config: SeriesConfig):
        self.config = config
        # archive level -> {(metric, interval): (value, write_seq)}
        self.slots: List[Dict[Tuple[str, int], Tuple[float, int]]] = [
            {} for _ in config.retentions
        ]

    def update_many(self, points, now: int) -> None:
        """points: iterable of (metric, ts, value, write_seq)."""
        cfg = self.config
        for metric, ts, value, seq in sorted(points, key=lambda p: p[3]):
            if ts > now or now - ts >= cfg.max_retention:
                continue
            r0 = cfg.retentions[0]
            interval = ts - ts % r0.seconds_per_point
            prev = self.slots[0].get((metric, interval))
            if prev is None or seq >= prev[1]:
                self.slots[0][(metric, interval)] = (value, seq)

    def _aggregate(self, values: List[Tuple[int, float]]) -> float:
        m = self.config.aggregation_method
        vs = [v for _, v in values]
        if m is AggregationMethod.AVERAGE:
            return sum(vs) / len(vs)
        if m is AggregationMethod.SUM:
            return sum(vs)
        if m is AggregationMethod.LAST:
            return max(values, key=lambda iv: iv[0])[1]
        if m is AggregationMethod.MAX:
            return max(vs)
        if m is AggregationMethod.MIN:
            return min(vs)
        raise ValueError(m)

    def archive(self, idx: int, now: int) -> Dict[Tuple[str, int], float]:
        cfg = self.config
        level = {
            k: v for k, (v, _) in self.slots[0].items()
        }
        for i in range(1, idx + 1):
            fine, coarse = cfg.retentions[i - 1], cfg.retentions[i]
            per_bucket = coarse.seconds_per_point // fine.seconds_per_point
            buckets: Dict[Tuple[str, int], List[Tuple[int, float]]] = {}
            for (metric, interval), value in level.items():
                ci = interval - interval % coarse.seconds_per_point
                buckets.setdefault((metric, ci), []).append((interval, value))
            level = {}
            for key, vals in buckets.items():
                if len(vals) / per_bucket >= cfg.x_files_factor:
                    level[key] = self._aggregate(vals)
        r = cfg.retentions[idx]
        return {
            (m, iv): v for (m, iv), v in level.items() if iv > now - r.retention
        }

    def fetch(
        self, metric: str, from_time: int, until_time: int, now: int
    ) -> Tuple[int, int, int, List[Optional[float]]]:
        cfg = self.config
        oldest = now - cfg.max_retention
        if from_time < oldest:
            from_time = oldest
        if until_time > now or until_time < oldest:
            until_time = now
        idx = cfg.archive_for_fetch(now - from_time)
        step = cfg.retentions[idx].seconds_per_point
        from_iv = from_time - from_time % step + step
        until_iv = until_time - until_time % step + step
        archive = self.archive(idx, now)
        values = [
            archive.get((metric, t))
            for t in range(from_iv, until_iv, step)
        ]
        return from_iv, until_iv, step, values
