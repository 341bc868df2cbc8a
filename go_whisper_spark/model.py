"""Pure-Python data model for the whisper-on-Spark engine.

Re-implements (from the public Whisper format specification and the
public go-whisper API surface — see SURVEY.md §0 for provenance) the
schema-level concepts of robyoung/go-whisper:

- ``Retention``            — one archive level ``(seconds_per_point, points)``
                             [ref: whisper.go (type Retention)]
- ``parse_retention_def``  — Graphite retention DSL ``"10s:6h"`` / ``"60:1440"``
                             [ref: whisper.go (func ParseRetentionDef)]
- ``parse_retention_defs`` — comma-separated list form
                             [ref: whisper.go (func ParseRetentionDefs)]
- ``validate_retentions``  — the 5 archive-list validation rules
                             [ref: whisper.go (func validateRetentions)]
- ``AggregationMethod``    — Average/Sum/Last/Max/Min enum
                             [ref: whisper.go (type AggregationMethod)]
- ``SeriesConfig``         — the 16-byte metadata header as a dataclass
                             [ref: whisper.go (func Create header write)]

No Spark imports here: this layer is the "catalog" and is deliberately
driver-side-only.  At 100 TB scale this config is a handful of rows per
metric namespace — it never touches an executor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Iterable, List, Sequence

__all__ = [
    "UNIT_MULTIPLIERS",
    "Retention",
    "AggregationMethod",
    "SeriesConfig",
    "parse_retention_def",
    "parse_retention_defs",
    "validate_retentions",
    "InvalidRetentionError",
]

#: Graphite retention-DSL unit suffixes → seconds.
#: [ref: whisper.go (unit multiplier helper); graphite docs "Retention strings"]
UNIT_MULTIPLIERS = {
    "s": 1,
    "m": 60,
    "h": 3600,
    "d": 86400,
    "w": 604800,
    "y": 31536000,
}

_PART_RE = re.compile(r"^(\d+)([smhdwy]?)$", re.IGNORECASE)


class InvalidRetentionError(ValueError):
    """Raised for unparseable or invalid retention definitions."""


class AggregationMethod(IntEnum):
    """The five whisper aggregation methods, with their wire codes.

    [ref: whisper.go (type AggregationMethod, const iota block)] —
    Average=1, Sum=2, Last=3, Max=4, Min=5.
    """

    AVERAGE = 1
    SUM = 2
    LAST = 3
    MAX = 4
    MIN = 5

    @classmethod
    def from_name(cls, name: str) -> "AggregationMethod":
        try:
            return cls[name.strip().upper()]
        except KeyError:
            raise ValueError(f"unknown aggregation method: {name!r}") from None

    @property
    def sql_name(self) -> str:
        """Name used by the Spark/SQL expression layer (functions.rollup)."""
        return self.name.lower()


@dataclass(frozen=True, order=True)
class Retention:
    """One archive level: a resolution and how many points it keeps.

    [ref: whisper.go (type Retention{secondsPerPoint, numberOfPoints})]
    """

    seconds_per_point: int
    points: int

    @property
    def retention(self) -> int:
        """Total seconds of history this archive covers (spp × points).

        [ref: whisper.go (func (Retention) MaxRetention)]
        """
        return self.seconds_per_point * self.points

    def __str__(self) -> str:
        return f"{self.seconds_per_point}:{self.points}"


def _parse_part(part: str) -> tuple[int, str]:
    m = _PART_RE.match(part.strip())
    if not m:
        raise InvalidRetentionError(f"invalid retention part: {part!r}")
    return int(m.group(1)), m.group(2).lower()


def parse_retention_def(definition: str) -> Retention:
    """Parse one Graphite retention string into a :class:`Retention`.

    Grammar (public Graphite docs; [ref: whisper.go (func ParseRetentionDef)]):

    - ``"<precision>:<duration>"`` where either side is ``<int>[smhdwy]``.
    - Bare-integer precision = seconds-per-point; bare-integer duration =
      number of points (the historical ``"60:1440"`` form).
    - A unit on the duration side means *total seconds*, converted to points
      by integer division by the precision.
    """
    if definition.count(":") != 1:
        raise InvalidRetentionError(f"invalid retention definition: {definition!r}")
    prec_s, dur_s = definition.split(":")
    prec_n, prec_unit = _parse_part(prec_s)
    dur_n, dur_unit = _parse_part(dur_s)

    seconds_per_point = prec_n * UNIT_MULTIPLIERS.get(prec_unit or "s", 1)
    if seconds_per_point <= 0:
        raise InvalidRetentionError(f"precision must be positive: {definition!r}")

    if dur_unit:
        total_seconds = dur_n * UNIT_MULTIPLIERS[dur_unit]
        points = total_seconds // seconds_per_point
    else:
        points = dur_n
    if points <= 0:
        raise InvalidRetentionError(f"archive must hold at least 1 point: {definition!r}")
    return Retention(seconds_per_point, points)


def parse_retention_defs(definitions: str) -> List[Retention]:
    """Parse ``"10s:6h,1m:7d,10m:5y"`` into an ordered archive list.

    [ref: whisper.go (func ParseRetentionDefs)]
    """
    parts = [p for p in (s.strip() for s in definitions.split(",")) if p]
    if not parts:
        raise InvalidRetentionError("empty retention definition list")
    return [parse_retention_def(p) for p in parts]


def validate_retentions(retentions: Sequence[Retention]) -> None:
    """Apply the five whisper archive-list validation rules.

    [ref: whisper.go (func validateRetentions)] — the rules, in order:

    1. list must be non-empty;
    2. no two archives may share a precision;
    3. archives must be ordered fine → coarse (strictly increasing spp);
    4. each coarser precision must be a whole multiple of the next finer;
    5. each coarser archive must cover a strictly longer period, and the
       finer archive must hold at least one full coarse bucket of points
       (otherwise consolidation is impossible).
    """
    if not retentions:
        raise InvalidRetentionError("a whisper series requires at least one archive")
    for i, (fine, coarse) in enumerate(zip(retentions, retentions[1:])):
        if fine.seconds_per_point == coarse.seconds_per_point:
            raise InvalidRetentionError(
                f"archives {i} and {i + 1} share precision {fine.seconds_per_point}s"
            )
        if fine.seconds_per_point > coarse.seconds_per_point:
            raise InvalidRetentionError(
                f"archives must be ordered fine->coarse: "
                f"{fine.seconds_per_point}s before {coarse.seconds_per_point}s"
            )
        if coarse.seconds_per_point % fine.seconds_per_point != 0:
            raise InvalidRetentionError(
                f"coarse precision {coarse.seconds_per_point}s is not a whole "
                f"multiple of finer precision {fine.seconds_per_point}s"
            )
        if coarse.retention <= fine.retention:
            raise InvalidRetentionError(
                f"archive {i + 1} must cover a longer period "
                f"({coarse.retention}s <= {fine.retention}s)"
            )
        points_per_consolidation = coarse.seconds_per_point // fine.seconds_per_point
        if fine.points < points_per_consolidation:
            raise InvalidRetentionError(
                f"archive {i} has {fine.points} points but one archive-{i + 1} "
                f"bucket needs {points_per_consolidation}"
            )


@dataclass(frozen=True)
class SeriesConfig:
    """Schema-level definition of one series family (the metadata header).

    [ref: whisper.go (func Create — metadata write; type Whisper fields)]

    In the Spark engine this is one row of the ``series_config`` catalog
    rather than a 16-byte binary header; ``metric`` may be a family
    pattern (all metrics in one points table share the config here).
    """

    retentions: tuple = field(default_factory=tuple)
    aggregation_method: AggregationMethod = AggregationMethod.AVERAGE
    x_files_factor: float = 0.5

    def __post_init__(self):
        rts = tuple(self.retentions)
        object.__setattr__(self, "retentions", rts)
        validate_retentions(rts)
        if not (0.0 <= self.x_files_factor <= 1.0):
            raise InvalidRetentionError(
                f"xFilesFactor must be in [0,1]: {self.x_files_factor}"
            )

    @classmethod
    def from_defs(
        cls,
        definitions: str,
        aggregation_method: "AggregationMethod | str" = AggregationMethod.AVERAGE,
        x_files_factor: float = 0.5,
    ) -> "SeriesConfig":
        if isinstance(aggregation_method, str):
            aggregation_method = AggregationMethod.from_name(aggregation_method)
        return cls(
            retentions=tuple(parse_retention_defs(definitions)),
            aggregation_method=aggregation_method,
            x_files_factor=x_files_factor,
        )

    @property
    def max_retention(self) -> int:
        """[ref: whisper.go (func (*Whisper) MaxRetention)]"""
        return self.retentions[-1].retention

    def archive_for_age(self, age_seconds: int) -> int:
        """Index of the finest archive whose retention covers ``age_seconds``.

        [ref: whisper.go (func (*Whisper) Update — archive selection walk)]
        Raises ValueError if the age exceeds max retention.
        """
        for i, r in enumerate(self.retentions):
            if r.retention > age_seconds:
                return i
        raise ValueError(f"age {age_seconds}s exceeds max retention {self.max_retention}s")

    def archive_for_fetch(self, from_age_seconds: int) -> int:
        """Index of the finest archive covering a fetch that starts
        ``from_age_seconds`` ago — selection is by *from* age only.

        [ref: whisper.go (func (*Whisper) Fetch — archive pick by from age)]
        """
        for i, r in enumerate(self.retentions):
            if r.retention >= from_age_seconds:
                return i
        return len(self.retentions) - 1
