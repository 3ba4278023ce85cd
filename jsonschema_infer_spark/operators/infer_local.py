"""Local (single-process) schema inference — the reference-parity API.

This is the oracle the distributed fold is tested against: the same
SchemaState semantics driven sequentially, exposing the reference
Generator's surface (`/root/reference/jsonschema.go`):

    New/options        -> SchemaInferrer(config) / default_config(...)
    AddSample          -> add_sample(json_str)
    AddParsedSample    -> add_parsed_sample(value)
    Generate           -> generate()
    GenerateTo         -> generate_to(writer)
    GetCurrentSchema   -> get_current_schema()
    Load               -> load(schema_json)

No mutex: this class is not shared across threads — concurrency in the new
engine comes from the associative merge (SURVEY.md §2.4), not locking.
"""

from __future__ import annotations

import json

from ..config import InferConfig, default_config
from ..plans.render import load_schema, render_schema, render_schema_to
from ..operators import state as S


class NoSamplesError(ValueError):
    """Generate() with zero samples (jsonschema.go:136-138)."""


class SchemaInferrer:
    def __init__(self, config: InferConfig | None = None, **kwargs):
        self.config = config if config is not None else default_config(**kwargs)
        self.state = S.new_state()
        self.sample_count = 0
        self._cached_schema: dict | None = None

    # -- ingest ---------------------------------------------------------------

    def add_sample(self, json_data: str) -> None:
        """Parse JSON then fold (AddSample, jsonschema.go:57-63)."""
        try:
            data = json.loads(json_data)
        except json.JSONDecodeError as e:
            raise ValueError(f"failed to parse JSON: {e}") from e
        self.add_parsed_sample(data)

    def add_parsed_sample(self, data) -> None:
        """Fold one parsed value (AddParsedSample, jsonschema.go:69-92):
        max-samples guard, count, observe, cache invalidation. Predefined
        overrides are config-time here (applied at render), which is
        observationally identical to the reference's per-sample stamping."""
        if self.config.max_samples > 0 and self.sample_count >= self.config.max_samples:
            return
        self.sample_count += 1
        S.observe_value(self.state, data, self.config)
        self._cached_schema = None

    # -- output ---------------------------------------------------------------

    def _build(self) -> dict:
        if self._cached_schema is None:
            self._cached_schema = S.finalize(self.state, self.config)
        return self._cached_schema

    def generate(self) -> str:
        if self.sample_count == 0:
            raise NoSamplesError("no samples added")
        return render_schema(self._build(), self.config.indent)

    def generate_to(self, w) -> None:
        if self.sample_count == 0:
            raise NoSamplesError("no samples added")
        render_schema_to(self._build(), w, self.config.indent)

    def get_current_schema(self) -> dict:
        return self._build()

    # -- resume ---------------------------------------------------------------

    def load(self, schema_json: str) -> None:
        """Load a previously generated schema (Load, jsonschema.go:178-209):
        object-root only; tree rebuilt with synthetic counts; the loaded
        schema is cached verbatim until the next sample."""
        state, schema = load_schema(schema_json)
        self.state = state
        self.sample_count = 1
        self._cached_schema = schema
