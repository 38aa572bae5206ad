"""Range readers over local files and HTTP(S) — the remote-source gate.

The reference treats any container behind `http(s)://` as a
first-class source via range requests
(versatiles_core/src/io/data_reader_http.rs; registry dispatch
versatiles_container/src/types/container_registry.rs:196-246). This
module is the engine analogue: a tiny `read(offset, length)`
abstraction with a local-file and an HTTP implementation (urllib,
`Range:` header, bounded retries), plus scheme dispatch. Container
readers (pmtiles, random access) accept either transparently; read
tasks re-open their own reader from the picklable URL/path, so a
Dataset fetch stage works unchanged against a remote archive.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

_RETRIES = 3
_TIMEOUT_S = 30.0


class FileDataReader:
    """Local file range reader (pread-style, stateless per call)."""

    def __init__(self, path: str):
        self.path = path

    def read(self, offset: int, length: int) -> bytes:
        with open(self.path, "rb") as f:
            f.seek(offset)
            return f.read(length)

    def size(self) -> int:
        import os

        return os.stat(self.path).st_size


class HttpDataReader:
    """HTTP(S) range reader: one GET with a `Range:` header per read.

    Servers that ignore Range (status 200) still work — the full body
    is sliced locally (correct, just not cheap; logged once). Retries
    transient failures with linear backoff.
    """

    def __init__(self, url: str):
        self.url = url
        self._warned_no_range = False

    def _request(self, headers: dict):
        req = urllib.request.Request(self.url, headers=headers)
        last = None
        for attempt in range(_RETRIES):
            try:
                return urllib.request.urlopen(req, timeout=_TIMEOUT_S)
            except (urllib.error.URLError, TimeoutError) as e:  # pragma: no cover
                last = e
                time.sleep(0.2 * (attempt + 1))
        raise last  # pragma: no cover

    def read(self, offset: int, length: int) -> bytes:
        if length <= 0:
            return b""
        resp = self._request({"Range": f"bytes={offset}-{offset + length - 1}"})
        body = resp.read()
        if resp.status == 206:
            return body
        # server ignored Range: slice the full body
        if not self._warned_no_range:
            import logging

            logging.getLogger(__name__).warning(
                "server at %s ignores Range requests; falling back to full reads",
                self.url,
            )
            self._warned_no_range = True
        return body[offset : offset + length]

    def size(self) -> int:
        try:
            req = urllib.request.Request(self.url, method="HEAD")
            resp = urllib.request.urlopen(req, timeout=_TIMEOUT_S)
            cl = resp.headers.get("Content-Length")
            if cl is not None:
                return int(cl)
        except urllib.error.URLError:  # pragma: no cover
            pass
        resp = self._request({"Range": "bytes=0-0"})  # pragma: no cover
        cr = resp.headers.get("Content-Range", "")  # pragma: no cover
        return int(cr.rsplit("/", 1)[-1])  # pragma: no cover


def is_remote(path: str) -> bool:
    return path.startswith("http://") or path.startswith("https://")


def open_data_reader(path: str):
    """Dispatch on scheme, mirroring the reference registry's
    `http(s)://` branch (container_registry.rs:196-246)."""
    return HttpDataReader(path) if is_remote(path) else FileDataReader(path)
