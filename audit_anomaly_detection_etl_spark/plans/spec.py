"""Declarative validation-suite specification.

Reference analogue: the YAML config + OmegaConf interpolation that *is* the
reference's IR (SURVEY.md §3.4). Here the spec is a dataclass tree; its
canonical-JSON hash becomes part of checkpoint lineage, so editing the spec
automatically invalidates prior partition verdicts (plans/checkpoint.py).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from .. import __version__
from ..functions import codecs
from ..operators.drift import BinSpec
from ..operators.schema_check import ColumnSpec, TableSchemaSpec


def default_clips_schema_spec() -> TableSchemaSpec:
    return TableSchemaSpec(
        columns=[
            ColumnSpec("clip_id", "string", nullable=False),
            ColumnSpec("bytes", "binary", nullable=False),
            ColumnSpec("sr_hz", "int", min_value=1, max_value=384_000),
            ColumnSpec("dur_ms", "int", min_value=1),
            ColumnSpec("codec", "string", nullable=False, allowed=list(codecs.CODECS)),
            ColumnSpec("transcript", "string"),
        ],
        key_col="clip_id",
        part_col="part",
    )


@dataclass
class SuiteSpec:
    """What to validate. ``checks`` subsets allow cheap smoke suites."""

    schema_spec: TableSchemaSpec = field(default_factory=default_clips_schema_spec)
    drift_specs: list[BinSpec] = field(
        default_factory=lambda: [
            BinSpec("dur_ms", 0.0, 20000.0, 40),
            BinSpec("sr_hz", 0.0, 48000.0, 48),
        ]
    )
    psi_threshold: float = 0.25
    checks: tuple = ("schema", "stats", "uniqueness", "referential", "drift", "payload")
    # partitioning contract: when the table is bucket-partitioned by
    # hash(key) (Iceberg bucket(clip_id) / our crc32 synth), uniqueness and
    # referential checks decompose per-partition and resume safely. If False
    # they run globally on every invocation (cheap: key columns only).
    key_partitioned: bool = True
    uniqueness_salts: int = 32

    def spec_hash(self) -> str:
        def enc(o):
            if hasattr(o, "__dict__"):
                return {k: enc(v) for k, v in vars(o).items()}
            if isinstance(o, (list, tuple)):
                return [enc(x) for x in o]
            if isinstance(o, dict):
                return {k: enc(v) for k, v in o.items()}
            return o

        blob = json.dumps(
            {"spec": enc(self), "engine": __version__}, sort_keys=True, default=str
        )
        return hashlib.sha256(blob.encode()).hexdigest()[:16]
