"""Config system: env-var override naming, typed getters, required
keys, sink registry (KeyspacesConfig.java:240-374,488-548)."""

from __future__ import annotations

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.config import (
    ConfigError,
    EngineConfig,
    build_sink,
    env_var_name,
    load_config,
    pipeline_config,
    sink_names,
)


def test_env_var_name_mapping():
    # KeyspacesConfig.java:361-374: strip prefix, . and - -> _, upper
    assert (
        env_var_name("keyspaces-cdc-streams.s3.max-message-size")
        == "S3_MAX_MESSAGE_SIZE"
    )
    assert env_var_name("keyspaces-cdc-streams.filter-expression") == (
        "FILTER_EXPRESSION"
    )
    assert env_var_name("other.key-name") == "OTHER_KEY_NAME"


def test_env_overrides_file_value():
    cfg = EngineConfig(
        {"keyspaces-cdc-streams.record-format": "full"},
        env={"RECORD_FORMAT": "new-image"},
    )
    assert cfg.get("keyspaces-cdc-streams.record-format") == "new-image"


def test_required_key_raises():
    cfg = EngineConfig({}, env={})
    with pytest.raises(ConfigError, match="required"):
        cfg.get("keyspaces-cdc-streams.stream-arn", required=True)


def test_env_satisfies_required():
    cfg = EngineConfig({}, env={"STREAM_ARN": "arn:x"})
    assert cfg.get("keyspaces-cdc-streams.stream-arn", required=True) == "arn:x"


def test_list_from_env_comma_split():
    cfg = EngineConfig({}, env={"FIELDS_TO_INCLUDE": "a, b ,c"})
    assert cfg.get_list("keyspaces-cdc-streams.fields-to-include") == [
        "a",
        "b",
        "c",
    ]


def test_bool_parse_boolean_semantics():
    cfg = EngineConfig(
        {"k.a": True, "k.b": "TRUE", "k.c": "yes", "k.d": "false"}, env={}
    )
    assert cfg.get_bool("k.a") and cfg.get_bool("k.b")
    assert not cfg.get_bool("k.c")  # parseBoolean: only "true" is true
    assert not cfg.get_bool("k.d")
    assert cfg.get_bool("k.missing", default=True)


def test_malformed_int_env_falls_back():
    # KeyspacesConfig.java:323-329: warn + default, not raise
    cfg = EngineConfig({}, env={"MAX_MESSAGE_SIZE": "not-a-number"})
    assert cfg.get_int("keyspaces-cdc-streams.max-message-size", 262144) == 262144


def test_parse_flat_and_json_text():
    flat = load_config(
        """
        # comment
        keyspaces-cdc-streams.record-format = full
        keyspaces-cdc-streams.max-message-size: 1024
        """,
        env={},
    )
    assert flat.get("keyspaces-cdc-streams.record-format") == "full"
    assert flat.get_int("keyspaces-cdc-streams.max-message-size") == 1024

    js = load_config(
        '{"keyspaces-cdc-streams": {"record-format": "old-image"}}', env={}
    )
    assert js.get("keyspaces-cdc-streams.record-format") == "old-image"


def test_pipeline_config_defaults_and_mapping():
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "filter-expression": "value > 1",
                "fields-to-include": ["user_id", "value"],
            }
        },
        env={},
    )
    pc = pipeline_config(cfg)
    assert pc.filter_expression == "value > 1"
    assert pc.record_format == "default"
    assert pc.include_metadata is True
    assert list(pc.fields_to_include) == ["user_id", "value"]


def test_sink_registry(tmp_path):
    assert {"object-store", "queue", "console"} <= set(sink_names())
    sink = build_sink("object-store", out_dir=str(tmp_path / "o"))
    assert callable(sink)
    with pytest.raises(ConfigError, match="unknown sink"):
        build_sink("does-not-exist")
