"""Engine configuration — the reference's config system re-expressed.

Reference (``KeyspacesConfig.java``):

- HOCON file with env-var override per key: the env name strips the
  leading ``keyspaces-cdc-streams.`` prefix, replaces ``.``/``-`` with
  ``_`` and uppercases (``KeyspacesConfig.java:361-374``); env always
  wins (``:260-270``); lists are comma-split (``:276-291``); booleans
  via ``parseBoolean`` (``:297-311``); a malformed numeric env value
  falls back to the default with a warning (``:317-334``).
- required keys raise when absent (``:269-272``).
- the sink ("target mapper") is loaded reflectively by FQCN with a
  Config-arg constructor (``:407-420,488-548``) — here a plain name
  registry (reflective class loading is a JVM idiom, not a Spark one).

Config files: JSON or flat ``key = value`` lines (HOCON-lite — enough
for every config block the reference documents; full HOCON features
like includes/substitutions are out of scope).
"""

from __future__ import annotations

import json
import logging
import os
import re
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

logger = logging.getLogger(__name__)

ENV_PREFIX_RE = re.compile(r"^keyspaces-cdc-streams\.")

#: sink-name -> factory(options dict) -> (batch_df, batch_id) callable.
#: Registered lazily to avoid importing Spark at config-parse time.
_SINK_REGISTRY: dict[str, Callable[..., Any]] = {}


def env_var_name(config_path: str) -> str:
    """``keyspaces-cdc-streams.s3.max-message-size`` ->
    ``S3_MAX_MESSAGE_SIZE`` (KeyspacesConfig.java:361-374)."""
    without_prefix = ENV_PREFIX_RE.sub("", config_path)
    return re.sub(r"[.\-]", "_", without_prefix).upper()


class ConfigError(ValueError):
    """A required configuration value is missing."""


@dataclass
class EngineConfig:
    """Typed access over a flat key -> value mapping with env override.

    ``get*`` mirrors the reference's overload set: string, list, bool,
    int (each: env wins; required-missing raises; malformed numeric env
    value logs and falls back — KeyspacesConfig.java:240-334).
    """

    values: Mapping[str, Any] = field(default_factory=dict)
    env: Mapping[str, str] = field(default_factory=lambda: os.environ)

    def _lookup(self, path: str, required: bool) -> tuple[bool, Any]:
        env_val = self.env.get(env_var_name(path))
        if env_val is not None:
            return True, env_val
        if path in self.values:
            return True, self.values[path]
        if required:
            raise ConfigError(f"Configuration value is required: {path}")
        return False, None

    def get(self, path: str, default: str | None = None, required: bool = False) -> str | None:
        found, v = self._lookup(path, required)
        return str(v) if found else default

    def get_list(
        self,
        path: str,
        default: Sequence[str] | None = None,
        required: bool = False,
    ) -> list[str] | None:
        found, v = self._lookup(path, required)
        if not found:
            return list(default) if default is not None else None
        if isinstance(v, str):
            return [s.strip() for s in v.split(",")]  # env/flat form
        return [str(x) for x in v]

    def get_bool(self, path: str, default: bool = False, required: bool = False) -> bool:
        found, v = self._lookup(path, required)
        if not found:
            return default
        if isinstance(v, bool):
            return v
        # Boolean.parseBoolean: true iff equalsIgnoreCase("true")
        return str(v).strip().lower() == "true"

    def get_int(self, path: str, default: int = 0, required: bool = False) -> int:
        found, v = self._lookup(path, required)
        if not found:
            return default
        try:
            return int(str(v).strip())
        except ValueError:
            logger.warning("Invalid integer value for %s: %r", path, v)
            return default


def parse_config_text(text: str) -> dict[str, Any]:
    """Parse JSON or flat ``key = value`` / ``key: value`` lines."""
    stripped = text.lstrip()
    if stripped.startswith("{"):
        return _flatten(json.loads(text))
    out: dict[str, Any] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "//")):
            continue
        m = re.match(r"^([^=:\s]+)\s*[=:]\s*(.*)$", line)
        if not m:
            raise ConfigError(f"unparseable config line: {raw!r}")
        key, val = m.group(1), m.group(2).strip().strip('"')
        out[key] = val
    return out


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> dict[str, Any]:
    flat: dict[str, Any] = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            flat.update(_flatten(v, path))
        else:
            flat[path] = v
    return flat


def load_config(
    source: str | Mapping[str, Any],
    env: Mapping[str, str] | None = None,
) -> EngineConfig:
    """Build an EngineConfig from a file path, config text, or mapping."""
    if isinstance(source, Mapping):
        return EngineConfig(_flatten(source), env or os.environ)
    if os.path.exists(source):
        with open(source, encoding="utf-8") as fh:
            text = fh.read()
    else:
        text = source
    return EngineConfig(parse_config_text(text), env or os.environ)


# --- sink registry (the ITargetMapper seam) -------------------------------


def register_sink(name: str):
    """Decorator: register a sink factory under a plain name."""

    def wrap(factory: Callable[..., Any]) -> Callable[..., Any]:
        _SINK_REGISTRY[name] = factory
        return factory

    return wrap


def sink_names() -> list[str]:
    _ensure_builtin_sinks()
    return sorted(_SINK_REGISTRY)


def build_sink(name: str, **options: Any):
    """Instantiate a registered sink — the engine's replacement for the
    reference's reflective FQCN loading (KeyspacesConfig.java:488-548)."""
    _ensure_builtin_sinks()
    if name not in _SINK_REGISTRY:
        raise ConfigError(
            f"unknown sink {name!r}; registered: {sink_names()}"
        )
    return _SINK_REGISTRY[name](**options)


def _ensure_builtin_sinks() -> None:
    if _SINK_REGISTRY:
        return
    from sample_keyspaces_cdc_streams_connectors_spark.streaming import sinks as s

    _SINK_REGISTRY.update(
        {
            # S3TargetMapper analog
            "object-store": s.object_store_sink,
            # SQSTargetMapper analog
            "queue": s.queue_sink,
            # DefaultKeyspacesTargetMapper analog
            "console": s.console_sink,
        }
    )


# --- pipeline assembly from config ---------------------------------------

#: config keys (reference README names) -> PipelineConfig fields
_PIPELINE_KEYS = {
    "filter_expression": "keyspaces-cdc-streams.filter-expression",
    "record_format": "keyspaces-cdc-streams.record-format",
    "include_metadata": "keyspaces-cdc-streams.include-metadata",
    "fields_to_include": "keyspaces-cdc-streams.fields-to-include",
    "checkpoint_dir": "keyspaces-cdc-streams.checkpoint-location",
}

#: SQS connector per-message delay (SQSTargetMapper.java:36,60)
DELAY_SECONDS_KEY = "keyspaces-cdc-streams.stream.connector.delay-seconds"


def queue_delay_seconds(cfg: EngineConfig) -> int:
    """The ``delay-seconds`` connector option (default 0) — pass to
    ``queue_sink(..., delay_seconds=...)`` so every outbound message
    entry carries it, like the reference's SQSJsonConverter."""
    return cfg.get_int(DELAY_SECONDS_KEY, default=0)


def pipeline_config(cfg: EngineConfig):
    """EngineConfig -> PipelineConfig with the reference defaults
    (record-format default, include-metadata true)."""
    from sample_keyspaces_cdc_streams_connectors_spark.streaming import PipelineConfig

    return PipelineConfig(
        filter_expression=cfg.get(_PIPELINE_KEYS["filter_expression"]),
        record_format=cfg.get(_PIPELINE_KEYS["record_format"], "default"),
        fields_to_include=cfg.get_list(_PIPELINE_KEYS["fields_to_include"]),
        include_metadata=cfg.get_bool(
            _PIPELINE_KEYS["include_metadata"], default=True
        ),
        checkpoint_dir=cfg.get(_PIPELINE_KEYS["checkpoint_dir"]),
    )
