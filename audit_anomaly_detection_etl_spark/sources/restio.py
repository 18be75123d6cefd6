"""REST API source connector (SURVEY.md S1/S2).

Reference analogues:

- GET JSON + pluck the ``results`` array (data table) or
  ``content.survey`` (questionnaire table)
  (data_download/nodes.py:20-42, catalog.yml:2-11,29-38)
- bounded retry: 5 attempts / 2 s backoff per request
  (data_download/nodes.py:79-100)
- pre-flight reachability probe with ``&limit=1`` and status-code → message
  mapping (app_utils/kobo_tools.py:6-24)
- credential-format regex ``^Token\\s[a-fA-F0-9]{40}$``
  (app_utils/kobo_tools.py:35-37)
- 1-row metadata probe verifying every configured ``mapping`` column exists,
  reported per-column (app_utils/kobo_tools.py:42-87)

Spark-first design: the driver never *parses* a large payload. Pages are
streamed to a staging directory as JSON-lines files (one file per page, so
Spark schedules one scan task per page) and handed to ``spark.read.json``
with an explicit schema — parsing, projection, and filtering happen on
executors with pushdown intact. Only the tiny probe endpoints
(reachability, column check) are decoded driver-side.

The HTTP transport is injectable (``transport=``): a callable
``(url, headers) -> (status_code, body_bytes)``. The default uses stdlib
``urllib``; tests and the sandbox (no network) inject deterministic fakes.
Retries wrap the transport call exactly like the reference's download loop.
"""

from __future__ import annotations

import json
import os
import re
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str, dict], tuple[int, bytes]]

TOKEN_PATTERN = r"^Token\s[a-fA-F0-9]{40}$"  # kobo_tools.py:35

_STATUS_MESSAGES = {  # kobo_tools.py:12-22
    200: ("Success", "Successfully connected to the API."),
    401: ("Error", "Error 401: Unauthorized. Check the server and your token."),
    403: ("Error", "Error 403: Access forbidden. Check your permissions and token."),
    404: ("Error", "Error 404: Resource not found. Check the asset id and permissions."),
}


def default_transport(url: str, headers: dict) -> tuple[int, bytes]:
    """Stdlib HTTP GET. Not reachable in this sandbox (no network); kept so
    the connector is production-shaped. file:// URLs work everywhere and are
    the test/staging path."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a status
        return e.code, e.read()


class RestSource:
    """One configured API endpoint: base url + credentials + retry policy."""

    def __init__(
        self,
        url: str,
        credentials: str | None = None,
        transport: Transport | None = None,
        max_retries: int = 5,
        retry_delay: float = 2.0,
    ):
        self.url = url
        self.credentials = credentials
        self.transport = transport or default_transport
        self.max_retries = max_retries
        self.retry_delay = retry_delay

    # -- probes (driver-side, tiny payloads) --------------------------------

    def check_credentials_format(self) -> tuple[bool, str]:
        """Regex-validate the token shape before any network call
        (kobo_tools.py:26-40)."""
        if self.credentials is None:
            return False, "Missing credentials."
        if not re.match(TOKEN_PATTERN, self.credentials):
            return False, (
                "Invalid token format. Expected 'Token <40-char hex token>'."
            )
        return True, "Credential format is valid."

    def _probe_url(self) -> str:
        """1-row probe URL: '&limit=1' only fits a url that already has a
        query string; bare urls need '?'."""
        sep = "&" if "?" in self.url else "?"
        return f"{self.url}{sep}limit=1"

    def check_reachability(self) -> tuple[str, str]:
        """GET a 1-row probe and map the status code (kobo_tools.py:6-24).
        Transport exceptions come back as ('Error', message), not raises —
        this is a pre-flight, not the load."""
        try:
            status, _ = self._get(self._probe_url(), retries=1)
        except Exception as e:
            return "Error", f"Connection error: {e}"
        if status in _STATUS_MESSAGES:
            return _STATUS_MESSAGES[status]
        return "Error", f"Error {status}: Problem connecting to the API."

    def check_columns(self, raw_data_columns: dict, data_key: str = "results") -> list[dict]:
        """1-row metadata probe: verify every configured ``mapping`` column
        exists in the payload (kobo_tools.py:42-87). Returns violation rows
        (engine-style) — empty list means all present."""
        status, body = self._get(self._probe_url())
        if status != 200:
            return [{"column": None, "violation": f"probe_failed_http_{status}"}]
        try:
            rows = json.loads(body)[data_key]
            present: set[str] = set()
            for r in rows:
                present.update(r.keys())
        except (KeyError, ValueError, TypeError, AttributeError):
            # KeyError/ValueError: missing data_key / not JSON;
            # TypeError: top-level array indexed by string;
            # AttributeError: rows that aren't objects (no .keys())
            return [{"column": None, "violation": "unexpected_payload_format"}]
        return [
            {"column": spec.get("mapping", ""), "violation": "missing_field"}
            for spec in raw_data_columns.values()
            if spec.get("mapping", "") not in present
        ]

    # -- scans ---------------------------------------------------------------

    def scan_json(
        self,
        spark: SparkSession,
        staging_dir: str,
        data_key: str = "results",
        schema: str | None = None,
        next_key: str = "next",
        max_pages: int = 100_000,
    ) -> DataFrame:
        """Paged REST scan → staged JSON-lines → distributed parse (S1).

        The driver follows ``next`` links, writing each page's ``data_key``
        array verbatim as one ``page-N.jsonl`` staging file — it re-serializes
        records but never inspects them, so driver memory is one page. Spark
        then parses all pages in parallel; pass an explicit DDL ``schema`` on
        big loads (inference re-reads the staging data).
        """
        import re as _re

        os.makedirs(staging_dir, exist_ok=True)
        # a re-scan into the same directory must not inherit stale pages: a
        # shrunken API would leave page files beyond the new last page, and
        # spark.read.json would silently include them as phantom rows.
        for fname in os.listdir(staging_dir):
            if _re.fullmatch(r"page-\d{5}\.jsonl", fname):
                os.remove(os.path.join(staging_dir, fname))
            else:
                raise OSError(
                    f"staging_dir {staging_dir!r} contains unexpected file "
                    f"{fname!r}; refusing to scan into a shared directory"
                )
        url: str | None = self.url
        n = 0
        while url is not None and n < max_pages:
            _, body = self._get_ok(url)
            payload = json.loads(body)
            rows = payload[data_key]
            with open(os.path.join(staging_dir, f"page-{n:05d}.jsonl"), "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
            url = payload.get(next_key)
            n += 1
        if url is not None:
            # cap-hit with a pending next link: a partial scan presented as
            # complete would silently understate rows/violations — for a
            # validation engine that is worse than failing loudly (the cap
            # exists as a pagination-cycle guard, not a sampling knob)
            raise RuntimeError(
                f"scan_json: max_pages={max_pages} reached with more pages "
                f"pending (next={url!r}); raise max_pages or fix the API's "
                "pagination"
            )
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(staging_dir)

    def scan_questionnaire(
        self,
        spark: SparkSession,
        location_key: str = "content",
        survey_key: str = "survey",
        schema: str | None = None,
    ) -> DataFrame:
        """Questionnaire scan (S2): pluck ``content.survey``
        (data_download/nodes.py:36-42). Questionnaires are form definitions —
        hundreds of rows — so this one is a driver-side createDataFrame, the
        correct plan for a broadcast-sized dim table."""
        _, body = self._get_ok(self.url)
        data = json.loads(body)[location_key][survey_key]
        if schema is not None:
            return spark.createDataFrame(data, schema=schema)
        return spark.createDataFrame(data)

    # -- internals -----------------------------------------------------------

    def _headers(self) -> dict:
        return {"Authorization": self.credentials} if self.credentials else {}

    def _get(self, url: str, retries: int | None = None) -> tuple[int, bytes]:
        """Transport call under the reference's retry loop
        (data_download/nodes.py:81-100): attempt, sleep ``retry_delay``,
        re-raise after ``max_retries`` failures."""
        attempts = retries if retries is not None else self.max_retries
        attempt = 0
        while True:
            try:
                return self.transport(url, self._headers())
            except Exception:
                attempt += 1
                if attempt >= attempts:
                    raise
                time.sleep(self.retry_delay)

    def _get_ok(self, url: str) -> tuple[int, bytes]:
        status, body = self._get(url)
        if status != 200:
            raise OSError(f"HTTP {status} fetching {url}")
        return status, body


def file_transport(url: str, headers: dict) -> tuple[int, bytes]:
    """Transport for ``file://`` URLs (and bare paths): reads local JSON
    fixtures. Missing file → 404, mirroring an HTTP API. Used by tests and
    the sandbox, where the network does not exist."""
    path = url[len("file://") :] if url.startswith("file://") else url
    path = path.split("?")[0].split("&")[0]
    if not os.path.exists(path):
        return 404, b"{}"
    with open(path, "rb") as f:
        return 200, f.read()
