"""Inference configuration.

Reference parity: the functional options of JLugagne/jsonschema-infer
(`/root/reference/options.go:4-99`, `/root/reference/jsonschema.go:27-53`),
re-expressed as an immutable config value passed to the fold — the Spark
engine has no mutable Generator object; configuration travels with the job.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

# JSON Schema draft versions (reference: options.go:9-14)
DRAFT06 = "http://json-schema.org/draft-06/schema#"
DRAFT07 = "http://json-schema.org/draft-07/schema#"

# Predefined type overrides (reference: options.go:28-36)
PREDEFINED_TYPES = frozenset(
    {"datetime", "string", "boolean", "number", "integer", "array", "object"}
)


@dataclass(frozen=True)
class CustomFormat:
    """A named format detector (reference: options.go:19-23).

    ``detector`` takes one string and returns bool. ``vectorized`` optionally
    takes a pandas Series[str] and returns a boolean Series — used on the
    batch path; when absent the scalar detector is mapped.
    """

    name: str
    detector: Callable[[str], bool]
    vectorized: Optional[Callable] = None


@dataclass(frozen=True)
class InferConfig:
    """All inference options (reference: options.go:39-99).

    - ``formats``: ordered detector list; priority = position (reference
      registers built-ins first, customs appended: jsonschema.go:44-53,
      options.go:59-66).
    - ``predefined``: field-name -> forced type, applied to root-level object
      properties only (jsonschema.go:95-102).
    - ``max_samples``: global ingest cap (options.go:50-54); order-dependent,
      realized as a deterministic ``limit`` before the distributed fold.
    - ``examples``: capture first value per node (options.go:86-90; default
      off, jsonschema.go:33). In the distributed fold "first" is defined
      under a stable total order supplied by the caller (SURVEY.md §2.4).
    """

    formats: tuple = ()  # tuple[CustomFormat, ...]
    predefined: dict = field(default_factory=dict)  # {field_name: predefined type}
    max_samples: int = 0  # 0 = unlimited
    schema_version: str = DRAFT07
    examples: bool = False
    indent: str = ""  # "" = compact output

    def format_names(self) -> list:
        return [f.name for f in self.formats]

    def detector_map(self) -> dict:
        return {f.name: f for f in self.formats}


def default_config(**kwargs) -> InferConfig:
    """Config with the built-in format registry (jsonschema.go:44-53).

    ``custom_formats`` (a sequence of CustomFormat) is appended AFTER the
    built-ins, matching the reference's WithFormats append semantics
    (options.go:59-66) — built-ins keep priority on ties. To replace the
    registry outright, pass ``formats`` instead.
    """
    from .functions.formats import built_in_formats

    customs = tuple(kwargs.pop("custom_formats", ()))
    kwargs.setdefault("formats", tuple(built_in_formats()) + customs)
    if "predefined" in kwargs:
        bad = set(kwargs["predefined"].values()) - PREDEFINED_TYPES
        if bad:
            raise ValueError(f"unknown predefined types: {bad}")
    return InferConfig(**kwargs)
