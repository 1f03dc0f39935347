"""Settings tests — port of cpp/ingester/src/ingester_settings_test.cpp:
JSON parse precedence, regex routing (first match wins), filter semantics
(whitelist over blacklist), defaults."""

from river_spark.ingest.settings import (
    DEFAULT_BYTES_PER_ROW_GROUP,
    DEFAULT_MINIMUM_AGE_S,
    DEFAULT_SAMPLES_PER_READ,
    IngesterSettings,
    StreamIngestionSettings,
)

EXAMPLE = """
{
  "stale_period_ms": 60000,
  "streams": [
    {"stream_name_regex": "neural_.*",
     "bytes_per_row_group": 1048576,
     "samples_per_read": 128,
     "minimum_age_seconds_before_deletion": 5,
     "columns_whitelist": ["ch[0-9]+"]},
    {"stream_name_regex": ".*",
     "columns_blacklist": ["debug_.*"]}
  ]
}
"""


def test_json_parse_and_defaults():
    s = IngesterSettings.from_json(EXAMPLE)
    assert s.stale_period_ms == 60000
    neural = s.settings_for("neural_probe1")
    assert neural.bytes_per_row_group == 1048576
    assert neural.samples_per_read == 128
    assert neural.minimum_age_seconds_before_deletion == 5
    other = s.settings_for("misc")
    assert other.bytes_per_row_group == DEFAULT_BYTES_PER_ROW_GROUP
    assert other.samples_per_read == DEFAULT_SAMPLES_PER_READ
    assert other.minimum_age_seconds_before_deletion == DEFAULT_MINIMUM_AGE_S


def test_first_match_wins():
    s = IngesterSettings.from_json(EXAMPLE)
    # neural_* matches the first entry even though .* also matches
    assert s.settings_for("neural_x").columns_whitelist == ["ch[0-9]+"]
    assert s.settings_for("plain").columns_whitelist == []


def test_filter_whitelist_wins_over_blacklist():
    s = StreamIngestionSettings(
        columns_whitelist=["ch[0-9]+"], columns_blacklist=["ch1"]
    )
    # whitelist wins entirely (ingester_settings.h:63-81)
    assert s.filter_fields(["ch1", "ch2", "aux"]) == ["ch1", "ch2"]


def test_filter_blacklist_only():
    s = StreamIngestionSettings(columns_blacklist=["debug_.*"])
    assert s.filter_fields(["a", "debug_x", "b"]) == ["a", "b"]


def test_regex_is_fullmatch():
    s = StreamIngestionSettings(stream_name_regex="neural")
    assert s.matches("neural") and not s.matches("neural_probe")


def test_no_match_skips_stream():
    s = IngesterSettings(streams=[StreamIngestionSettings(stream_name_regex="only_this")])
    assert s.settings_for("something_else") is None
