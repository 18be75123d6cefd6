"""REST API source connector (SURVEY.md S1/S2, sources/restio.py).

Covers the reference's connector semantics without a network: retry/backoff
(data_download/nodes.py:79-100), credential regex (kobo_tools.py:35-37),
status-code mapping (kobo_tools.py:6-24), 1-row column probe
(kobo_tools.py:42-87), paged scan-to-staging, questionnaire pluck
(data_download/nodes.py:36-42).
"""

from __future__ import annotations

import json

import pytest

from audit_anomaly_detection_etl_spark.sources import restio

GOOD_TOKEN = "Token " + "a1" * 20


def _paged_transport(pages: dict[str, dict], fail_first: int = 0, log: list | None = None):
    """Fake transport serving a dict of url -> payload; first ``fail_first``
    calls raise (connection flake)."""
    calls = {"n": 0}

    def transport(url: str, headers: dict):
        if log is not None:
            log.append((url, dict(headers)))
        calls["n"] += 1
        if calls["n"] <= fail_first:
            raise OSError("flaky connection")
        base = url.split("&limit=")[0].split("?limit=")[0]
        if base not in pages:
            return 404, b"{}"
        return 200, json.dumps(pages[base]).encode()

    return transport


class TestCredentialFormat:
    def test_valid(self):
        src = restio.RestSource("u?x=1", credentials=GOOD_TOKEN)
        ok, _ = src.check_credentials_format()
        assert ok

    @pytest.mark.parametrize(
        "tok",
        [None, "Token short", "token " + "a1" * 20, "Token " + "z" * 40, "a1" * 20],
    )
    def test_invalid(self, tok):
        src = restio.RestSource("u?x=1", credentials=tok)
        ok, msg = src.check_credentials_format()
        assert not ok and msg


class TestRetry:
    def test_succeeds_within_budget(self):
        t = _paged_transport({"u?x=1": {"results": [{"a": 1}]}}, fail_first=2)
        src = restio.RestSource("u?x=1", transport=t, max_retries=5, retry_delay=0)
        status, body = src._get("u?x=1")
        assert status == 200 and json.loads(body)["results"] == [{"a": 1}]

    def test_exhausts_and_reraises(self):
        t = _paged_transport({}, fail_first=99)
        src = restio.RestSource("u?x=1", transport=t, max_retries=5, retry_delay=0)
        with pytest.raises(OSError, match="flaky"):
            src._get("u?x=1")

    def test_auth_header_sent(self):
        log: list = []
        t = _paged_transport({"u?x=1": {"results": []}}, log=log)
        src = restio.RestSource("u?x=1", credentials=GOOD_TOKEN, transport=t, retry_delay=0)
        src._get("u?x=1")
        assert log[0][1] == {"Authorization": GOOD_TOKEN}


class TestReachability:
    def test_status_mapping(self):
        for code, expect in [(200, "Success"), (401, "Error"), (403, "Error"), (404, "Error"), (500, "Error")]:

            def t(url, headers, code=code):
                return code, b"{}"

            src = restio.RestSource("u?x=1", transport=t, retry_delay=0)
            status, msg = src.check_reachability()
            assert status == expect
            if code != 200:
                assert str(code) in msg or "Problem" in msg or code == 500

    def test_connection_error_is_reported_not_raised(self):
        def t(url, headers):
            raise OSError("down")

        src = restio.RestSource("u?x=1", transport=t, retry_delay=0)
        status, msg = src.check_reachability()
        assert status == "Error" and "down" in msg


class TestColumnProbe:
    def test_missing_columns_reported(self):
        t = _paged_transport({"u?x=1": {"results": [{"_uuid": "a", "start": 1}]}})
        src = restio.RestSource("u?x=1", transport=t, retry_delay=0)
        spec = {
            "audit_id": {"mapping": "_uuid", "dtype": "str"},
            "start": {"mapping": "start", "dtype": "float"},
            "missing1": {"mapping": "_nope", "dtype": "str"},
        }
        v = src.check_columns(spec)
        assert v == [{"column": "_nope", "violation": "missing_field"}]

    def test_http_error_probe(self):
        t = _paged_transport({})
        src = restio.RestSource("u?x=1", transport=t, retry_delay=0)
        v = src.check_columns({"a": {"mapping": "a"}})
        assert v[0]["violation"] == "probe_failed_http_404"

    def test_bad_payload(self):
        def t(url, headers):
            return 200, b'{"not_results": []}'

        src = restio.RestSource("u?x=1", transport=t, retry_delay=0)
        v = src.check_columns({"a": {"mapping": "a"}})
        assert v[0]["violation"] == "unexpected_payload_format"


class TestScans:
    def test_paged_scan_follows_next(self, spark, tmp_path):
        pages = {
            "api?page=1": {"results": [{"id": 1, "v": 1.5}, {"id": 2, "v": None}], "next": "api?page=2"},
            "api?page=2": {"results": [{"id": 3, "v": 2.5}], "next": None},
        }
        src = restio.RestSource("api?page=1", transport=_paged_transport(pages), retry_delay=0)
        df = src.scan_json(spark, str(tmp_path / "stage"), schema="id bigint, v double")
        rows = sorted((r.id, r.v) for r in df.collect())
        assert rows == [(1, 1.5), (2, None), (3, 2.5)]
        # one staging file per page -> one scan task per page
        assert len(list((tmp_path / "stage").glob("page-*.jsonl"))) == 2

    def test_max_pages_bound_raises_on_pending_pages(self, spark, tmp_path):
        """A cap-hit with a next link still pending must raise, not return a
        partial scan presented as complete (a validation engine silently
        understating rows is worse than failing loudly)."""
        import pytest

        pages = {"api?page=1": {"results": [{"id": 1}], "next": "api?page=1"}}  # cycle
        src = restio.RestSource("api?page=1", transport=_paged_transport(pages), retry_delay=0)
        with pytest.raises(RuntimeError, match="max_pages=3 reached"):
            src.scan_json(spark, str(tmp_path / "s2"), schema="id bigint", max_pages=3)

    def test_rescan_clears_stale_pages(self, spark, tmp_path):
        # first scan: 2 pages; second scan into the SAME dir: 1 page — the
        # stale page-00001 must not contribute phantom rows
        two = {
            "api?page=1": {"results": [{"id": 1}], "next": "api?page=2"},
            "api?page=2": {"results": [{"id": 2}], "next": None},
        }
        one = {"api?page=1": {"results": [{"id": 9}], "next": None}}
        d = str(tmp_path / "stage")
        restio.RestSource("api?page=1", transport=_paged_transport(two),
                          retry_delay=0).scan_json(spark, d, schema="id bigint").count()
        df = restio.RestSource("api?page=1", transport=_paged_transport(one),
                               retry_delay=0).scan_json(spark, d, schema="id bigint")
        assert [r.id for r in df.collect()] == [9]

    def test_scan_refuses_foreign_files_in_staging(self, spark, tmp_path):
        d = tmp_path / "stage"
        d.mkdir()
        (d / "unrelated.txt").write_text("x")
        src = restio.RestSource(
            "api?page=1",
            transport=_paged_transport({"api?page=1": {"results": [], "next": None}}),
            retry_delay=0,
        )
        import pytest

        with pytest.raises(OSError, match="unexpected file"):
            src.scan_json(spark, str(d), schema="id bigint")

    def test_questionnaire_pluck(self, spark):
        payload = {"content": {"survey": [{"name": "q1", "type": "integer"}, {"name": "q2", "type": "text"}]}}
        src = restio.RestSource("api?f=1", transport=_paged_transport({"api?f=1": payload}), retry_delay=0)
        df = src.scan_questionnaire(spark, schema="name string, type string")
        assert sorted((r.name, r.type) for r in df.collect()) == [("q1", "integer"), ("q2", "text")]

    def test_file_transport(self, spark, tmp_path):
        p = tmp_path / "fixture.json"
        p.write_text(json.dumps({"results": [{"k": "x"}], "next": None}))
        src = restio.RestSource(f"file://{p}", transport=restio.file_transport, retry_delay=0)
        df = src.scan_json(spark, str(tmp_path / "s3"), schema="k string")
        assert [r.k for r in df.collect()] == ["x"]
        missing = restio.RestSource(f"file://{tmp_path}/nope.json", transport=restio.file_transport)
        status, _ = missing.check_reachability()
        assert status == "Error"


class TestProbeHardening:
    def test_bare_url_probe_uses_question_mark(self):
        log: list = []
        t = _paged_transport({"bare/data.json": {"results": [{"a": 1}]}}, log=log)
        src = restio.RestSource("bare/data.json", transport=t, retry_delay=0)
        status, _ = src.check_reachability()
        assert status == "Success"
        assert log[0][0] == "bare/data.json?limit=1"  # not '&limit=1'

    def test_array_payload_probe_reports_not_crashes(self):
        def t(url, headers):
            return 200, b'[{"a": 1}]'  # top-level array, no data_key

        src = restio.RestSource("u?x=1", transport=t, retry_delay=0)
        out = src.check_columns({"c": {"mapping": "a"}})
        assert out == [{"column": None, "violation": "unexpected_payload_format"}]

    def test_non_object_rows_probe_reports_not_crashes(self):
        def t(url, headers):
            return 200, b'{"results": [1, 2]}'  # rows without .keys()

        src = restio.RestSource("u?x=1", transport=t, retry_delay=0)
        out = src.check_columns({"c": {"mapping": "a"}})
        assert out == [{"column": None, "violation": "unexpected_payload_format"}]
