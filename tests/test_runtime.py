"""Worker runtime: health endpoint, worker identity, stream discovery
(HealthServer.java:10-28, AWSHelpers.java:20-52,
KeyspacesConfig.java:174-215)."""

import urllib.error
import urllib.request

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.runtime import (
    HealthServer,
    StreamDescriptor,
    create_worker_id,
    get_stream_arn,
)


@pytest.fixture()
def health():
    srv = HealthServer(port=0).start()
    yield srv
    srv.stop()


class TestHealthServer:
    def test_health_returns_200_ok(self, health):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{health.port}/health"
        ) as resp:
            assert resp.status == 200
            assert resp.read() == b"OK"

    def test_other_paths_404(self, health):
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"http://127.0.0.1:{health.port}/nope")
        assert exc.value.code == 404


class TestWorkerId:
    def test_assumed_role_arn_uses_session_name(self):
        wid = create_worker_id(
            lambda: "arn:aws:sts::123:assumed-role/my-role/i-0abc123",
            clock_ms=lambda: 1700000000000,
        )
        assert wid == "sts:i-0abc123-1700000000000"

    def test_non_role_arn_uses_whole_arn(self):
        wid = create_worker_id(
            lambda: "arn:aws:iam::123:user/alice",
            clock_ms=lambda: 5,
        )
        assert wid == "sts:arn:aws:iam::123:user/alice-5"

    def test_long_identity_truncates_to_last_256(self):
        long_sess = "x" * 300
        wid = create_worker_id(
            lambda: f"arn:aws:sts::123:assumed-role/r/{long_sess}",
            clock_ms=lambda: 5,
        )
        assert wid == "sts:" + "x" * 256 + "-5"

    def test_provider_failure_falls_back_to_guid(self):
        def boom():
            raise RuntimeError("no credentials")

        wid = create_worker_id(boom)
        assert len(wid) == 36 and wid.count("-") == 4

    def test_no_provider_falls_back_to_guid(self):
        wid = create_worker_id()
        assert len(wid) == 36


STREAMS = [
    StreamDescriptor("arn:a", "KS", "Tbl", "2024-01"),
    StreamDescriptor("arn:b", "ks", "tbl", "2024-02"),
    StreamDescriptor("arn:c", "other", "tbl", "2024-01"),
]


class TestStreamDiscovery:
    def test_configured_arn_short_circuits(self):
        def never():
            raise AssertionError("must not list")

        assert (
            get_stream_arn("ks", "tbl", configured_arn="arn:x", list_streams=never)
            == "arn:x"
        )

    def test_first_case_insensitive_match_without_label(self):
        assert get_stream_arn("ks", "TBL", list_streams=lambda: STREAMS) == "arn:a"

    def test_label_filter_selects_exact_stream(self):
        assert (
            get_stream_arn(
                "ks", "tbl", stream_label="2024-02", list_streams=lambda: STREAMS
            )
            == "arn:b"
        )

    def test_no_match_returns_none(self):
        assert (
            get_stream_arn(
                "ks", "tbl", stream_label="2099-01", list_streams=lambda: STREAMS
            )
            is None
        )

    def test_listing_error_returns_none(self):
        def boom():
            raise RuntimeError("api down")

        assert get_stream_arn("ks", "tbl", list_streams=boom) is None

    def test_no_lister_returns_none(self):
        assert get_stream_arn("ks", "tbl") is None
